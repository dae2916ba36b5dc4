"""Quick per-query timing harness for the optimization round.

NOT the driver bench (bench.py is frozen): this file exists to time a
SUBSET of queries with the same methodology (fresh session, one warm
flagship-free pass, noop sink) so individual optimizations can be
iterated without paying a full bench run. Evidence quoted in
OPTIMIZATION_r06.md cites either this file or full bench.py runs,
always saying which.

Usage: python bench_extra.py q_extract_page q_minhash_dedup ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_EXTRA_REPS (default 2 timed reps per query, min reported).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "2"))
    names = sys.argv[1:]
    if not names:
        print("usage: bench_extra.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)

    from cmoncrawl_spark import queries as q
    from cmoncrawl_spark.session import get_spark

    spark = get_spark("cmoncrawl-bench-extra", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup doctrine as bench.py
    q.q_token_count(spark, sf_dir).count()
    q.prepare_frontier_state(spark, sf_dir)

    def _run_crawl_once() -> float:
        import shutil
        import tempfile

        from cmoncrawl_spark.datagen import register_crawl_views
        from cmoncrawl_spark.streaming.rounds import StateStore, run_crawl

        register_crawl_views(spark, sf_dir)
        seeds = spark.table("pages").select("url", "depth", "priority")
        policies = spark.table("host_policies")
        state_dir = tempfile.mkdtemp(prefix="bench_rounds_")
        try:
            t0 = time.monotonic()
            run_crawl(StateStore(spark, state_dir), seeds, policies, rounds=3)
            return round(time.monotonic() - t0, 3)
        finally:
            shutil.rmtree(state_dir, ignore_errors=True)

    out: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            if name == "crawl_3_rounds":
                samples.append(_run_crawl_once())
            else:
                fn = getattr(q, name)
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = samples
    print(json.dumps({n: {"min": min(s), "samples": s} for n, s in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
