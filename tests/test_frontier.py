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
