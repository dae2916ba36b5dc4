"""Bloom seen-set + frontier scheduling round tests."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cmoncrawl_spark.datagen import register_crawl_views
from cmoncrawl_spark.operators import bloom as bloom_ops
from cmoncrawl_spark.operators.frontier import (
    canonicalize,
    dedupe_intra_batch,
    per_host_topk,
    scheduling_round,
)


def _frontier(spark, sf_dir):
    register_crawl_views(spark, sf_dir)
    return spark.table("pages").select("url", "depth", "priority")


def _seen(spark):
    return (
        spark.table("pages")
        .where(F.col("doc_id") % 6 == 0)
        .select(F.col("canonical_expected").alias("url_id"))
        .distinct()
    )


def test_bloom_no_false_negatives(spark, sf_dir):
    register_crawl_views(spark, sf_dir)
    seen = _seen(spark)
    shards = bloom_ops.build_shards(seen, num_shards=8, expected_per_shard=1000)
    probed = bloom_ops.probe(seen, shards, num_shards=8)
    n = probed.count()
    pos = probed.where("maybe_seen").count()
    assert n > 0 and pos == n  # every inserted id must probe positive


def test_slim_probe_positive_ids_supersets_seen(spark, sf_dir):
    """probe_positive_ids == {ids whose bloom test passes}: contains
    every truly-seen candidate (no false negatives) and agrees with
    the full-width probe's maybe_seen flags exactly."""
    register_crawl_views(spark, sf_dir)
    cand = canonicalize(_frontier(spark, sf_dir))
    seen = _seen(spark)
    shards = bloom_ops.build_shards(seen, num_shards=8, expected_per_shard=1000)
    pos = set(
        r["url_id"]
        for r in bloom_ops.probe_positive_ids(
            cand, shards, num_shards=8
        ).collect()
    )
    flags = {
        r["url_id"]: r["maybe_seen"]
        for r in bloom_ops.probe(cand, shards, num_shards=8).collect()
    }
    assert pos == {u for u, m in flags.items() if m}
    truly_seen = {r["url_id"] for r in seen.collect()} & set(flags)
    assert truly_seen <= pos


def test_bloom_dedupe_equals_exact_antijoin(spark, sf_dir):
    cand = canonicalize(_frontier(spark, sf_dir))
    seen = _seen(spark)
    shards = bloom_ops.build_shards(seen, num_shards=8, expected_per_shard=1000)
    exact = set(
        r["url"]
        for r in cand.join(seen, "url_id", "left_anti").select("url").collect()
    )
    with_bloom = set(
        r["url"]
        for r in bloom_ops.dedupe_against_seen(cand, seen, shards, num_shards=8)
        .select("url")
        .collect()
    )
    assert with_bloom == exact


def test_fetch_schedule_keeps_unlisted_hosts(spark):
    """Hosts with no policy row (no robots.txt parsed) must still be
    scheduled, at the default crawl delay — not silently dropped."""
    from cmoncrawl_spark.operators.frontier import fetch_schedule

    fetch = spark.createDataFrame(
        [("a.com/1", "a.com", 1), ("a.com/2", "a.com", 2), ("b.org/1", "b.org", 1)],
        "url_id string, host string, fetch_rank int",
    )
    policies = spark.createDataFrame(
        [("a.com", 2.0)], "host string, crawl_delay_s double"
    )
    rows = {
        r["url_id"]: (r["fetch_offset_ms"], r["crawl_delay_s"])
        for r in fetch_schedule(fetch, policies, default_delay=1.0).collect()
    }
    assert rows == {
        "a.com/1": (0, 2.0),
        "a.com/2": (2000, 2.0),
        "b.org/1": (0, 1.0),  # unlisted host kept, default delay
    }


def test_bloom_probe_multi_blob_shards(spark, sf_dir):
    """A shard may carry several blob rows (merge_bloom_shards keeps one
    blob per (shard_id, m_bits, k_hashes) parameterization): membership
    must be the OR over ALL blobs, not just the first row — a
    first-row-only probe silently loses half the seen set."""
    register_crawl_views(spark, sf_dir)
    seen = _seen(spark).orderBy("url_id")
    a = seen.limit(20)
    b = seen.subtract(a)
    # different expected_per_shard -> different (m_bits, k_hashes):
    # merged shards legitimately hold two blob rows per shard_id
    shards = bloom_ops.build_shards(
        a, num_shards=4, expected_per_shard=500
    ).unionByName(
        bloom_ops.build_shards(b, num_shards=4, expected_per_shard=2000)
    )
    probed = bloom_ops.probe(seen, shards, num_shards=4)
    n = probed.count()
    pos = probed.where("maybe_seen").count()
    assert n > 20 and pos == n  # ids from BOTH blobs probe positive

    # exactness contract survives the mixed-parameter shard table
    cand = canonicalize(_frontier(spark, sf_dir))
    exact = set(
        r["url"]
        for r in cand.join(seen, "url_id", "left_anti").select("url").collect()
    )
    got = set(
        r["url"]
        for r in bloom_ops.dedupe_against_seen(cand, seen, shards, num_shards=4)
        .select("url")
        .collect()
    )
    assert got == exact


def test_salted_topk_equals_plain_window(spark, sf_dir):
    cand = dedupe_intra_batch(canonicalize(_frontier(spark, sf_dir)))
    cand = cand.withColumn("budget", F.lit(5))
    salted = per_host_topk(cand, salt_buckets=7)
    w = Window.partitionBy("host").orderBy(
        F.col("depth").asc(), F.col("priority").desc(), F.col("url_id").asc()
    )
    plain = (
        cand.withColumn("fetch_rank", F.row_number().over(w))
        .where(F.col("fetch_rank") <= F.col("budget"))
    )
    a = sorted(
        (r["host"], r["url_id"], r["fetch_rank"])
        for r in salted.select("host", "url_id", "fetch_rank").collect()
    )
    b = sorted(
        (r["host"], r["url_id"], r["fetch_rank"])
        for r in plain.select("host", "url_id", "fetch_rank").collect()
    )
    assert a == b and len(a) > 0


def test_round_deterministic_across_parallelism(spark, sf_dir):
    frontier = _frontier(spark, sf_dir)
    seen = _seen(spark)
    pol = spark.table("host_policies").withColumnRenamed(
        "robots_disallow_all", "robots_disallow_all"
    )
    outs = []
    for salt in (4, 16):
        out = scheduling_round(
            frontier.repartition(3 if salt == 4 else 11),
            seen,
            pol,
            salt_buckets=salt,
        )
        outs.append(
            sorted(
                (r["host"], r["fetch_rank"], r["url_id"])
                for r in out.collect()
            )
        )
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_round_respects_budget_and_robots(spark, sf_dir):
    frontier = _frontier(spark, sf_dir)
    seen = _seen(spark)
    pol = spark.table("host_policies")
    out = scheduling_round(frontier, seen, pol).cache()
    per_host = out.groupBy("host").agg(
        F.count("*").alias("n"), F.max("budget").alias("budget")
    )
    assert per_host.where(F.col("n") > F.col("budget")).count() == 0
    banned = pol.where("robots_disallow_all").select("host")
    assert out.join(banned, "host", "inner").count() == 0


def test_domain_key_modes_identical_output(spark, sf_dir):
    """canonicalize(domain_politeness=True) must produce IDENTICAL
    rows whether the PSL ladder runs inline on every URL or on
    distinct hosts with a map-back join (the r5 'distinct' default) —
    including NULL hosts (malformed URLs survive via the LEFT join)
    and hosts that ARE a public suffix (keep the raw host key)."""
    frontier = _frontier(spark, sf_dir).unionByName(
        spark.createDataFrame(
            [
                ("https://co.uk/path", 1, 0.5),       # host IS a suffix
                ("https://a.b.x.co.za/p", 1, 0.5),    # full-list ccTLD
                ("not a url at all", 2, 0.1),          # null host
            ],
            "url string, depth int, priority double",
        )
    )
    outs = []
    for mode in ("distinct", "inline"):
        out = canonicalize(
            frontier, domain_politeness=True, domain_key_mode=mode
        )
        outs.append(
            sorted(
                (r["url"], r["url_id"], r["host"]) for r in out.collect()
            )
        )
    assert outs[0] == outs[1] and len(outs[0]) > 0
    hosts = dict((u, h) for u, _, h in outs[0])
    assert hosts["https://co.uk/path"] == "co.uk"       # suffix keeps host
    assert hosts["https://a.b.x.co.za/p"] == "x.co.za"  # eTLD+1


def test_domain_round_distinct_mode_equals_inline(spark, sf_dir):
    """Full scheduling_round parity across domain_key_mode — the two
    plans differ (map-back join vs row expressions) but the fetch list
    must be bit-identical."""
    frontier = _frontier(spark, sf_dir)
    seen = _seen(spark)
    from cmoncrawl_spark.queries import prepare_domain_policies

    pol = spark.read.parquet(prepare_domain_policies(spark, sf_dir))
    outs = []
    for mode in ("distinct", "inline"):
        out = scheduling_round(
            frontier, seen, pol,
            domain_politeness=True, domain_key_mode=mode,
        )
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1] and len(outs[0]) > 0
