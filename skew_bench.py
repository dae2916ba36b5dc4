"""Hot-domain skew evidence: does the salted two-phase per-host top-k
earn its extra shuffle? (VERDICT r1 item 9 / SURVEY §7 R4.)

Runs the scheduling round on an amplified frontier (hot registered
domain holds ~40% of rows — datagen's skew fixture) in a 2x2 matrix:
{salted 16 buckets | unsalted} x {constant budget_cap (enables
pre-shuffle WindowGroupLimit) | no cap}. Best-of-N wall-clock each,
one JSON line out.

Interpretation guide: salting attacks the single-reducer hot-host
window; the constant cap attacks the same skew EARLIER (map-side
Partial group limit). The production plan uses both — this bench shows
what each contributes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from cmoncrawl_spark.datagen import register_crawl_views, with_crawl_ctes
    from cmoncrawl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    amplify = int(os.environ.get("SKEW_AMPLIFY", "960"))
    reps = int(os.environ.get("SKEW_REPS", "3"))

    spark = get_spark("skew-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    register_crawl_views(spark, sf_dir)
    frontier = spark.sql(
        with_crawl_ctes(
            "SELECT 'https://' || www || base_host || path || '/v' "
            "|| CAST(i AS STRING) || 'x' AS url, depth, priority "
            "FROM pages CROSS JOIN "
            f"(SELECT explode(sequence(1, {amplify})) AS i)"
        )
    ).repartition(128).localCheckpoint(eager=True)
    n_urls = frontier.count()
    seen = spark.table("seen").localCheckpoint(eager=True)
    policies = spark.table("host_policies").localCheckpoint(eager=True)
    cap = int(policies.agg(F.max("budget")).first()[0])

    def run2(salt_buckets: int, with_cap: bool) -> float:
        from cmoncrawl_spark.operators import bloom as bloom_ops
        from cmoncrawl_spark.operators.frontier import (
            canonicalize,
            dedupe_intra_batch,
            per_host_topk,
        )

        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            cand = dedupe_intra_batch(canonicalize(frontier))
            cand = bloom_ops.dedupe_against_seen(cand, seen)
            pol = policies.select("host", "budget", "robots_disallow_all")
            cand = cand.join(F.broadcast(pol), on="host", how="inner").where(
                ~F.col("robots_disallow_all")
            )
            per_host_topk(
                cand,
                salt_buckets=salt_buckets,
                budget_cap=cap if with_cap else None,
            ).select("url", "url_id", "host", "fetch_rank").write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    out = {
        "metric": "skew_topk_matrix_sec",
        "input_urls": n_urls,
        "hot_domain_share": 0.4,
        "cpus": cpus,
        "salt16_cap": run2(16, True),
        "salt16_nocap": run2(16, False),
        "salt1_cap": run2(1, True),
        "salt1_nocap": run2(1, False),
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
