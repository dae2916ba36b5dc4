"""Multi-round crawl: bit-for-bit vs the reference-faithful simulator,
and kill-and-resume from checkpoint."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cmoncrawl_spark.datagen import register_crawl_views
from cmoncrawl_spark.plans import simulator as sim
from cmoncrawl_spark.streaming.rounds import StateStore, run_crawl


@pytest.fixture
def setup(spark, sf_dir, tmp_path):
    register_crawl_views(spark, sf_dir)
    seeds_df = (
        spark.table("pages")
        .where(F.col("doc_id") < 300)
        .select("url", "depth", "priority")
    )
    pol_df = spark.table("host_policies")
    seeds = [
        sim.Candidate(r["url"], r["depth"], r["priority"])
        for r in seeds_df.collect()
    ]
    budgets = {}
    disallowed = set()
    for r in pol_df.collect():
        if r["robots_disallow_all"]:
            disallowed.add(r["host"])
        budgets[r["host"]] = r["budget"]
    return seeds_df, pol_df, seeds, budgets, disallowed, str(tmp_path / "state")


def _collect_round(store, r):
    return sorted(
        tuple(row)
        for row in store.read("fetch_list", r)
        .select("url", "url_id", "host", "depth", "priority", "budget", "fetch_rank")
        .collect()
    )


ROUNDS = 3


def test_rounds_match_simulator(spark, setup):
    seeds_df, pol_df, seeds, budgets, disallowed, state_dir = setup
    store = StateStore(spark, state_dir)
    run_crawl(store, seeds_df, pol_df, rounds=ROUNDS, num_shards=8)

    sim_rounds, sim_seen = sim.simulate_crawl(
        seeds, budgets, disallowed, rounds=ROUNDS
    )
    for r in range(ROUNDS):
        got = _collect_round(store, r)
        want = sorted(sim_rounds[r])
        assert got == want, f"round {r}: {len(got)} vs {len(want)} fetches"

    spark_seen = {
        row["url_id"]
        for row in store.read_all("seen_delta", ROUNDS - 1).collect()
    }
    assert spark_seen == sim_seen


def test_kill_and_resume(spark, setup):
    seeds_df, pol_df, _seeds, _b, _d, state_dir = setup
    # full run for reference
    full = StateStore(spark, state_dir + "_full")
    run_crawl(full, seeds_df, pol_df, rounds=ROUNDS, num_shards=8)
    # killed after round 1, resumed
    part = StateStore(spark, state_dir + "_part")
    run_crawl(part, seeds_df, pol_df, rounds=2, num_shards=8)
    assert part.last_committed_round() == 1
    run_crawl(part, seeds_df, pol_df, rounds=ROUNDS, num_shards=8)
    for r in range(ROUNDS):
        assert _collect_round(part, r) == _collect_round(full, r), f"round {r}"
    a = {x["url_id"] for x in part.read_all("seen_delta", ROUNDS - 1).collect()}
    b = {x["url_id"] for x in full.read_all("seen_delta", ROUNDS - 1).collect()}
    assert a == b


def test_metrics_lineage(spark, setup):
    seeds_df, pol_df, _s, _b, _d, state_dir = setup
    store = StateStore(spark, state_dir + "_m")
    run_crawl(store, seeds_df, pol_df, rounds=2, num_shards=8)
    m = store.read("metrics", 1)
    rows = m.collect()
    assert rows and all(r["round_id"] == 1 for r in rows)
    assert all(r["scheduled"] <= r["candidates"] for r in rows)


def test_failed_state_write_leaves_round_uncommitted(spark, setup):
    """The r6 concurrent state writes (guide §2.6) must keep the commit
    contract: if ANY of the overlapped per-round writes fails, the
    round marker is never written and a resume re-runs the round."""
    seeds_df, pol_df, _s, _b, _d, state_dir = setup
    store = StateStore(spark, state_dir + "_fail")

    real_write = StateStore.write

    def failing_write(self, name, round_id, df):
        if name == "bloom_shards":
            raise RuntimeError("injected write failure")
        return real_write(self, name, round_id, df)

    StateStore.write = failing_write
    try:
        with pytest.raises(RuntimeError, match="injected write failure"):
            run_crawl(store, seeds_df, pol_df, rounds=1, num_shards=8)
    finally:
        StateStore.write = real_write
    assert store.last_committed_round() == -1
    # the crawl is resumable after the fault clears: round 0 re-runs
    run_crawl(store, seeds_df, pol_df, rounds=1, num_shards=8)
    assert store.last_committed_round() == 0
