"""CrawlCatalog: snapshot-append, time travel, rollback (parquet
fallback path; the Iceberg path is the same API over SQL DDL)."""

from __future__ import annotations

from cmoncrawl_spark.catalog import CrawlCatalog


def test_append_read_timetravel_rollback(spark, tmp_path):
    cat = CrawlCatalog(spark, str(tmp_path / "wh"))
    assert cat.iceberg is False  # no iceberg jars in this sandbox
    cat.create_table("seen", "url_id string", partitioned_by=None)

    s0 = cat.append("seen", spark.createDataFrame([("a",), ("b",)], "url_id string"))
    s1 = cat.append("seen", spark.createDataFrame([("c",)], "url_id string"))
    assert cat.snapshots("seen") == [s0, s1] == [0, 1]

    assert {r["url_id"] for r in cat.read("seen").collect()} == {"a", "b", "c"}
    assert {r["url_id"] for r in cat.read("seen", as_of=s0).collect()} == {"a", "b"}

    cat.rollback("seen", s0)
    assert {r["url_id"] for r in cat.read("seen").collect()} == {"a", "b"}
    # append after rollback continues the snapshot line
    s2 = cat.append("seen", spark.createDataFrame([("d",)], "url_id string"))
    assert {r["url_id"] for r in cat.read("seen").collect()} == {"a", "b", "d"}
    assert cat.snapshots("seen") == [0, s2]


def test_partitioned_table_prunes(spark, tmp_path):
    cat = CrawlCatalog(spark, str(tmp_path / "wh"))
    cat.create_table("pages", "url string, crawl string", partitioned_by=["crawl"])
    cat.append("pages", spark.createDataFrame(
        [("u1", "CC-2021"), ("u2", "CC-2022")], "url string, crawl string"))
    df = cat.read("pages").where("crawl = 'CC-2021'")
    assert [r["url"] for r in df.collect()] == ["u1"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(crawl" in plan  # pruning reaches scan


def test_empty_table_reads_schema(spark, tmp_path):
    cat = CrawlCatalog(spark, str(tmp_path / "wh"))
    cat.create_table("metrics", "host string, scheduled bigint")
    df = cat.read("metrics")
    assert df.count() == 0
    assert set(df.columns) == {"host", "scheduled"}
