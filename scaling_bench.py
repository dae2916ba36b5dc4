"""Two-cluster-size scaling evidence (BASELINE.md protocol).

No multi-node cluster exists in this sandbox, so per the driver's
instruction the N->4N-executor criterion is evidenced by running the
IDENTICAL frontier round on the SAME input at two local parallelism
levels (local[N] and local[4N], shuffle partitions scaled with cores)
and reporting throughput at both plus scaling efficiency
(T_N / T_4N) / 4  — equivalently (throughput_4N / throughput_N) / 4.

Each level runs in a fresh subprocess so JVM/core settings are clean.
Prints one JSON line; also rewrites the results table in BASELINE.md
when --update-baseline is passed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from cmoncrawl_spark.session import get_spark
from cmoncrawl_spark.datagen import register_crawl_views, with_crawl_ctes
from cmoncrawl_spark.operators import bloom as bloom_ops
from cmoncrawl_spark.operators.frontier import scheduling_round

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; reps = int(sys.argv[3])
amplify = int(os.environ.get("SCALING_AMPLIFY", "960"))
spark = get_spark("scaling-bench", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
register_crawl_views(spark, sf_dir)

# Amplified frontier: each page spawns `amplify` distinct-canonical
# URLs (path variant ends in a letter so ids stay distinct) so the
# round's per-core work dominates fixed overhead — the same shape a
# 10^10-URL frontier has at cluster scale.
frontier = spark.sql(with_crawl_ctes(
    "SELECT 'https://' || www || base_host || path || '/v' "
    "|| CAST(i AS STRING) || 'x' AS url, depth, priority "
    "FROM pages CROSS JOIN "
    f"(SELECT explode(sequence(1, {amplify})) AS i)"))
# A real 10^10-URL frontier arrives as many Iceberg data files; the
# synthetic one collapses into 1-2 tasks (tiny parquet + explode), which
# would serialize every map stage. Fixed 128 partitions at BOTH core
# counts keeps the comparison fair.
frontier = frontier.repartition(128).localCheckpoint(eager=True)
n_urls = frontier.count()
seen = spark.table("seen")
policies = spark.table("host_policies")
shards = bloom_ops.build_shards(seen, num_shards=32,
                                expected_per_shard=200_000).localCheckpoint(eager=True)
shards.count()

cap = int(policies.agg({"budget": "max"}).first()[0])
best = None
for _ in range(reps):
    t0 = time.monotonic()
    scheduling_round(frontier, seen, policies, bloom_shards=shards,
                     num_shards=32, budget_cap=cap
                     ).write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"cores": cores, "sec": best, "input_urls": n_urls}))
spark.stop()
"""


def run_level(cores: int, sf_dir: str, reps: int = 3) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), sf_dir, str(reps)],
        capture_output=True,
        text=True,
        check=True,
        cwd="/root/repo",
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("SCALING_N", "8"))
    trials = int(os.environ.get("SCALING_TRIALS", "3"))
    # The sandbox is a noisy shared VM: interleave N / 4N trials and
    # take the best per level so neighbor noise doesn't masquerade as
    # (anti-)scaling.
    lo_runs, hi_runs = [], []
    for _ in range(trials):
        lo_runs.append(run_level(n, sf_dir, reps=2))
        hi_runs.append(run_level(4 * n, sf_dir, reps=2))
    lo = min(lo_runs, key=lambda r: r["sec"])
    hi = min(hi_runs, key=lambda r: r["sec"])
    thr_lo = lo["input_urls"] / lo["sec"]
    thr_hi = hi["input_urls"] / hi["sec"]
    eff = (thr_hi / thr_lo) / 4
    result = {
        "metric": "frontier_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "N_cores": n,
        "4N_cores": 4 * n,
        "sec_N": round(lo["sec"], 3),
        "sec_4N": round(hi["sec"], 3),
        "urls_per_sec_N": round(thr_lo, 1),
        "urls_per_sec_4N": round(thr_hi, 1),
        "input_urls": lo["input_urls"],
        "sf_dir": sf_dir,
    }
    print(json.dumps(result))
    if "--update-baseline" in sys.argv:
        _update_baseline(result)


def _update_baseline(r: dict) -> None:
    path = "/root/repo/BASELINE.md"
    with open(path) as f:
        text = f.read()
    marker = "| run | cores | input rows | round wall-clock (s) | URLs/s | efficiency |"
    table = (
        f"{marker}\n"
        f"|---|---|---|---|---|---|\n"
        f"| N | {r['N_cores']} | {r['input_urls']} | {r['sec_N']} | "
        f"{r['urls_per_sec_N']} | — |\n"
        f"| 4N | {r['4N_cores']} | {r['input_urls']} | {r['sec_4N']} | "
        f"{r['urls_per_sec_4N']} | {r['value']} |\n"
    )
    head = text.split(marker)[0]
    with open(path, "w") as f:
        f.write(head + table)


if __name__ == "__main__":
    main()
