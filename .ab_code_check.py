"""Code-level A/B: cluster 4N frontier round, HEAD engine vs the
round-4 commit (c372dd0), same input, same cluster, interleaved.

Purpose: the r5 quiet-window 4N samples (84.75 s at load 0.02) sit
~2x above r3's 42.13 s reference. Either the host degraded or a
round-5 code change slowed the host-keyed round. The only host-path
diff since r4 is parse_url -> try_parse_url; this measures it
directly instead of arguing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import zipfile

sys.path.insert(0, "/root/repo")

from cluster_bench import start_cluster, stop_cluster  # noqa: E402

WORKER = r"""
import json, sys, time
repo_root = sys.argv[5]
sys.path.insert(0, repo_root)
from pyspark.sql import SparkSession, functions as F
from cmoncrawl_spark.datagen import register_crawl_views, with_crawl_ctes
from cmoncrawl_spark.operators import bloom as bloom_ops
from cmoncrawl_spark.operators.frontier import scheduling_round

cores_max = int(sys.argv[1]); sf_dir = sys.argv[2]; amplify = int(sys.argv[3]); reps = int(sys.argv[4])
zip_path = sys.argv[6]
spark = (SparkSession.builder.appName(f"ab-code-{cores_max}")
    .master("spark://127.0.0.1:7077")
    .config("spark.cores.max", str(cores_max))
    .config("spark.executor.cores", "8")
    .config("spark.executor.memory", "7g")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile(zip_path)
register_crawl_views(spark, sf_dir)
frontier = spark.sql(with_crawl_ctes(
    "SELECT 'https://' || www || base_host || path || '/v' || CAST(i AS STRING) || 'x' AS url, depth, priority "
    f"FROM pages CROSS JOIN (SELECT explode(sequence(1, {amplify})) AS i)"
)).repartition(128).localCheckpoint(eager=True)
n_urls = frontier.count()
seen = spark.table("seen").localCheckpoint(eager=True)
policies = spark.table("host_policies").localCheckpoint(eager=True)
shards = bloom_ops.build_shards(seen, num_shards=32, expected_per_shard=200000).localCheckpoint(eager=True)
shards.count()
cap = int(policies.agg({"budget": "max"}).first()[0])
scheduling_round(frontier, seen, policies, bloom_shards=shards,
                 num_shards=32, budget_cap=cap).write.format("noop").mode("overwrite").save()
samples = []
for _ in range(reps):
    t0 = time.monotonic()
    scheduling_round(frontier, seen, policies, bloom_shards=shards,
                     num_shards=32, budget_cap=cap).write.format("noop").mode("overwrite").save()
    samples.append(round(time.monotonic() - t0, 2))
print(json.dumps({"sec": min(samples), "samples": samples, "input_urls": n_urls}))
spark.stop()
"""


def build_zip(root: str, path: str) -> str:
    pkg = os.path.join(root, "cmoncrawl_spark")
    with zipfile.ZipFile(path, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py") or f.endswith(".dat"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return path


def run(root: str, zip_path: str, amplify: int, reps: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, "32", "/root/testdata/sf0.1",
         str(amplify), str(reps), root, zip_path],
        capture_output=True, text=True, check=True, cwd=root, timeout=900,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    amplify = int(os.environ.get("AB_AMPLIFY", "1920"))
    reps = int(os.environ.get("AB_REPS", "2"))
    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    all_variants = {
        "head": ("/root/repo", build_zip("/root/repo", "/tmp/ab_head.zip")),
        "r4": ("/root/repo/.ab_r4",
               build_zip("/root/repo/.ab_r4", "/tmp/ab_r4.zip")),
    }
    order = os.environ.get("AB_ORDER", "head,r4").split(",")
    variants = {k: all_variants[k] for k in order}
    procs = start_cluster()
    results: dict[str, list] = {k: [] for k in variants}
    try:
        for _ in range(rounds):
            for name, (root, zp) in variants.items():
                r = run(root, zp, amplify, reps)
                r["variant"] = name
                results[name].append(r)
                print(json.dumps(r), flush=True)
    finally:
        stop_cluster(procs)
    summary = {
        name: min(s["sec"] for s in runs) for name, runs in results.items()
    }
    summary["all"] = {n: [s["samples"] for s in runs]
                      for n, runs in results.items()}
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
