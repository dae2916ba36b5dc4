"""Benchmark harness — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Noise protocol (BASELINE.md: this sandbox VM shows multi-x run-to-run
wall-clock variance from noisy neighbors): the harness runs
$SPARK_GRAFT_BENCH_TRIALS (default 3) INDEPENDENT trials, each in a
fresh subprocess / fresh JVM. A trial warms the JVM (parquet footers,
code paths, one untimed flagship run) and then times every headline
query once. The reported number per query is the MIN across trials —
the best estimate of the plan's true cost on this hardware — and every
sample is kept in "samples" so the spread is visible, not hidden.
Same protocol as scaling_bench.py (the N-vs-4N scaling-efficiency
evidence lives there).

Idle gate (round-5): each trial is launched only after the host's CPU
busy-fraction drops below $SPARK_GRAFT_BENCH_BUSY_MAX (default 0.10),
waiting up to $SPARK_GRAFT_BENCH_GATE_S (default 180 s) per trial —
the same gate .bench_sample.py uses for scaling samples. The busy
fraction observed at each trial's launch is disclosed in
"window_busy" so every sample carries its window's load context.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benchgate import wait_for_quiet_window as _wait_for_quiet_window  # noqa: E402

HEADLINE = [
    "q_frontier_round",
    "q_frontier_round_exact",
    "q_frontier_round_domain",
    "q_index_domain",
    "q_url_seen_dedup",
    "q_exact_dedup_docs",
    "q_minhash_dedup",
    "q_extract_page",
    "q_route_match",
    "q_token_count",
    "q_quality_stats",
    "q_cosine_topk",
    "q_embed_dup_pairs",
    "q_events_hourly",
    "q_curation_pipeline",
    "q_asof_join",
    "q_dedup_clusters",
    "q_robots_allowed",
]


def _run_trial(sf_dir: str, cpus: int) -> dict:
    """One full measurement pass in THIS process (fresh JVM when called
    via --worker). Returns {query: seconds} including crawl_3_rounds."""
    from cmoncrawl_spark import queries as q
    from cmoncrawl_spark.session import get_spark

    spark = get_spark("cmoncrawl-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so timings measure the plans,
    # and bootstrap the persisted URL-seen bloom shards (round-0 state:
    # a real round probes the previous round's checkpoint, it never
    # rebuilds the filter from full history inside the round).
    q.q_token_count(spark, sf_dir).count()
    q.prepare_frontier_state(spark, sf_dir)
    # one untimed flagship run: the steady-state crawl loop executes the
    # same physical plan every round — measure that, not the one-time
    # Python plan construction + parquet footer reads.
    q.q_frontier_round(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # same doctrine for the domain-politeness variant: its persisted
    # policy state + plan compile belong to round 0, not the steady
    # state the crawl loop repeats.
    q.q_frontier_round_domain(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = getattr(q, name)
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.monotonic() - t0, 3)

    # the real multi-round system: 3 checkpointed rounds with link
    # expansion and INCREMENTAL bloom merge (O(round), not O(history)).
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
        per_query["crawl_3_rounds"] = round(time.monotonic() - t0, 3)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)

    per_query["_frontier_urls"] = spark.table("pages").count()
    spark.stop()
    return per_query


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if "--worker" in sys.argv:
        print(json.dumps(_run_trial(sf_dir, cpus)))
        return

    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    runs: list[dict] = []
    window_busy: list[float] = []
    for _ in range(trials):
        window_busy.append(_wait_for_quiet_window())
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env=os.environ,
        )
        runs.append(json.loads(out.stdout.strip().splitlines()[-1]))

    n_urls = runs[0].pop("_frontier_urls")
    for r in runs[1:]:
        r.pop("_frontier_urls", None)
    names = list(runs[0].keys())
    per_query = {n: round(min(r[n] for r in runs), 3) for n in names}
    samples = {n: [r[n] for r in runs] for n in names}

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    # the north metric: frontier URLs scheduled+deduped per second per
    # round (input candidate count / flagship round wall-clock).
    out = {
        "metric": "frontier_round_sec",
        "value": per_query["q_frontier_round"],
        "unit": "sec",
        "frontier_urls": n_urls,
        "urls_per_sec": round(n_urls / per_query["q_frontier_round"], 1),
        "queries": per_query,
        "samples": samples,
        "window_busy": window_busy,
        "trials": trials,
        "protocol": "min over idle-gated fresh-JVM subprocess trials",
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
