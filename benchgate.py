"""Shared quiet-window gate for every bench harness in this repo.

One implementation so the harnesses gate identically and their
numbers stay like-for-like (bench.py, domain_ab_bench.py and
.bench_sample.py previously carried near-identical private copies —
any gate fix had to land three times or the A/Bs stopped being
comparable).

/proc/stat accounting: Linux folds ``guest`` and ``guest_nice`` INTO
``user`` and ``nice``, so summing all ten fields double-counts guest
time in the denominator and UNDERESTIMATES the busy fraction on a
VM-hosting machine — exactly the contamination the gate exists to
exclude. Only the first eight fields (user nice system idle iowait
irq softirq steal) are summed.
"""

from __future__ import annotations

import os
import time


def cpu_busy_frac(dt: float = 1.0) -> float:
    """Host-wide CPU busy fraction over a ``dt``-second window."""

    def snap() -> tuple[int, int]:
        parts = open("/proc/stat").readline().split()[1:9]
        vals = [int(x) for x in parts]
        idle = vals[3] + vals[4]  # idle + iowait
        return idle, sum(vals)

    i0, t0 = snap()
    time.sleep(dt)
    i1, t1 = snap()
    return 1.0 - (i1 - i0) / max(t1 - t0, 1)


def wait_for_quiet_window(
    busy_max: float | None = None, gate_s: float | None = None
) -> float:
    """Block (bounded) until the host looks idle; return the busy
    fraction observed when giving the go — disclose it per trial.

    Defaults come from ``$SPARK_GRAFT_BENCH_BUSY_MAX`` (0.10) and
    ``$SPARK_GRAFT_BENCH_GATE_S`` (180 s).
    """
    if busy_max is None:
        busy_max = float(os.environ.get("SPARK_GRAFT_BENCH_BUSY_MAX", "0.10"))
    if gate_s is None:
        gate_s = float(os.environ.get("SPARK_GRAFT_BENCH_GATE_S", "180"))
    deadline = time.monotonic() + gate_s
    busy = cpu_busy_frac()
    while busy > busy_max and time.monotonic() < deadline:
        busy = cpu_busy_frac()
    return round(busy, 3)
