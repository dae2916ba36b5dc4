"""Physical-plan regression tests — pin the PLANS.md claims.

A query that silently loses its pushed filters, its pre-shuffle group
limit, or its TakeOrderedAndProject is a 100×-scale regression that
row-level tests can't see. These assertions read the executed plan
string the same way `.explain("formatted")` renders it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cmoncrawl_spark.datagen import register_crawl_views


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_is_take_ordered_not_global_window(spark, sf_dir):
    from cmoncrawl_spark.session import load_tables
    from cmoncrawl_spark.operators.similarity import cosine_topk

    load_tables(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    qv = emb.where("vec_id = 0").select(
        F.col("embedding").cast("array<double>")
    ).first()[0]
    plan = _plan(cosine_topk(emb, F.array(*[F.lit(float(v)) for v in qv]), k=10))
    assert "TakeOrderedAndProject" in plan
    # the pre-limit section must not shuffle everything to one reducer
    pre = plan.split("TakeOrderedAndProject")[1]
    assert "Exchange SinglePartition" not in pre


def test_per_host_topk_has_preshuffle_group_limit(spark, sf_dir):
    from cmoncrawl_spark.operators.frontier import (
        canonicalize,
        per_host_topk,
    )

    register_crawl_views(spark, sf_dir)
    cand = canonicalize(
        spark.table("pages").select("url", "depth", "priority")
    ).withColumn("budget", F.lit(5))
    plan = _plan(per_host_topk(cand, budget_cap=5))
    # constant cap -> WindowGroupLimit applied in Partial mode BEFORE
    # the exchange (each input partition ships <= cap rows per group)
    partials = [
        l for l in plan.splitlines()
        if "WindowGroupLimit" in l and "Partia" in l
    ]
    assert partials, plan


def test_index_query_pushes_filters_and_prunes_columns(spark, sf_dir, tmp_path):
    """Over a MATERIALIZED (crawl, subset)-partitioned parquet ccindex
    (the production storage shape), the predicates must reach the scan:
    subset partition-prunes, fetch_status row-group-prunes, and the
    5-column projection prunes the read schema."""
    from cmoncrawl_spark.operators.ccindex import MatchType, index_query

    register_crawl_views(spark, sf_dir)
    path = str(tmp_path / "ccindex_pq")
    spark.table("ccindex").write.partitionBy("crawl", "subset").parquet(path)
    tbl = spark.read.parquet(path)
    plan = _plan(index_query(tbl, ["hot-domain.com"], MatchType.DOMAIN))
    assert "PartitionFilters" in plan and "subset" in plan
    assert "PushedFilters" in plan and "fetch_status" in plan
    # projection pruning: content_digest (unused) must not be read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "content_digest" not in read_schema[0]


def test_frontier_round_uses_broadcast_policies(spark, sf_dir):
    from cmoncrawl_spark.operators.frontier import scheduling_round

    register_crawl_views(spark, sf_dir)
    plan = _plan(
        scheduling_round(
            spark.table("pages").select("url", "depth", "priority"),
            spark.table("seen"),
            spark.table("host_policies"),
        )
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_extraction_prefilter_applied_before_udf(spark):
    from cmoncrawl_spark.extraction.extractor import (
        ConfigExtractor,
        CssField,
        apply_extractor,
    )

    df = spark.createDataFrame(
        [("https://news.x.com/a", b"<html><title>t</title></html>")],
        "url string, html binary",
    )
    ex = ConfigExtractor(
        fields={"t": CssField("title")}, allowed_domain_prefixes=["news"]
    )
    plan = _plan(apply_extractor(df, ex, passthrough=["url"]))
    # the prefix filter must appear BELOW (execute before) the Python stage
    assert "MapInPandas" in plan
    before_udf = plan.split("MapInPandas", 1)[1]
    assert "Filter" in before_udf and "news" in before_udf, plan


def test_ivf_list_partitioned_storage_prunes(spark, sf_dir, tmp_path):
    """The IVF scale path: corpus stored partitionBy(list_id) means an
    n_probe search READS only n_probe partitions — assert the partition
    filter reaches the scan."""
    from cmoncrawl_spark.session import load_tables
    from cmoncrawl_spark.operators.similarity import ivf_build

    load_tables(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    assignments, cents = ivf_build(emb, n_lists=4, iters=1)
    path = str(tmp_path / "ivf_pq")
    emb.join(
        assignments.withColumnRenamed("id", "vec_id"), "vec_id"
    ).write.partitionBy("list_id").parquet(path)
    probed = spark.read.parquet(path).where("list_id IN (0, 1)")
    plan = _plan(probed)
    assert "PartitionFilters" in plan and "list_id" in plan
    part_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "list_id" in part_line


def test_index_limit_is_take_ordered(spark, sf_dir):
    """L1/L2: deterministic-order limit compiles to
    TakeOrderedAndProject (per-partition heaps), not a global sort."""
    from cmoncrawl_spark.operators.ccindex import MatchType, index_query

    register_crawl_views(spark, sf_dir)
    plan = _plan(
        index_query(
            spark.table("ccindex"), ["hot-domain.com"], MatchType.DOMAIN,
            limit=10,
        )
    )
    assert "TakeOrderedAndProject" in plan, plan
