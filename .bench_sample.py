"""One controlled scaling sample set; args: cores... (alternating)."""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
from scaling_bench import run_level  # noqa: E402

DEADLINE = time.monotonic() + float(os.environ.get("SAMPLE_BUDGET_S", "480"))

out: dict = {}
for c in [int(x) for x in sys.argv[1:]] or [8, 32, 8, 32]:
    if time.monotonic() > DEADLINE:
        print("budget exhausted, stopping cleanly", flush=True)
        break
    subprocess.run(["pkill", "-9", "java"], capture_output=True)

    from benchgate import cpu_busy_frac  # shared gate (benchgate.py)

    t0 = time.monotonic()
    while cpu_busy_frac() > 0.10 and time.monotonic() - t0 < 45:
        pass
    try:
        r = run_level(c, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), reps=2)
    except subprocess.CalledProcessError as e:
        print("worker failed:", (e.stderr or "")[-500:], flush=True)
        continue
    out.setdefault(str(c), []).append(round(r["sec"], 2))
    print("sample", c, round(r["sec"], 2), flush=True)
print(json.dumps(out))
