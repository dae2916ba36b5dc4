"""Structured Streaming ingest test (file source -> windowed counts)."""

from __future__ import annotations

import json
import time


def test_streaming_ingest_counts(spark, tmp_path):
    from cmoncrawl_spark.streaming.ingest import run_ingest_to_memory

    land = tmp_path / "landing"
    land.mkdir()

    def rec(url, ts):
        return json.dumps(
            {
                "domain_record": {
                    "filename": "f",
                    "url": url,
                    "offset": 0,
                    "length": 1,
                    "timestamp": ts,
                },
                "additional_info": {},
            }
        )

    (land / "b1.jsonl").write_text(
        "\n".join(
            [
                rec("https://a.com/1", "2023-01-01 10:05:00"),
                rec("https://a.com/2", "2023-01-01 10:45:00"),
                rec("https://b.com/1", "2023-01-01 11:05:00"),
            ]
        )
    )
    q = run_ingest_to_memory(spark, str(land), query_name="t_ingest")
    try:
        q.processAllAvailable()
        got = {
            (str(r["window_start"]), r["host"]): r["n_records"]
            for r in spark.sql("select * from t_ingest").collect()
        }
        assert got[("2023-01-01 10:00:00", "a.com")] == 2
        assert got[("2023-01-01 11:00:00", "b.com")] == 1

        # late-arriving file lands in its own (earlier) window
        (land / "b2.jsonl").write_text(
            rec("https://a.com/3", "2023-01-01 10:59:00")
        )
        q.processAllAvailable()
        got2 = {
            (str(r["window_start"]), r["host"]): r["n_records"]
            for r in spark.sql("select * from t_ingest").collect()
        }
        assert got2[("2023-01-01 10:00:00", "a.com")] == 3
    finally:
        q.stop()


def test_stateful_host_admitter_budget_spans_microbatches(spark, tmp_path):
    """The GroupState ledger must persist ACROSS micro-batches: wave 1
    admits 3 of budget 5; wave 2 brings 4 more but only 2 fit."""
    from cmoncrawl_spark.streaming.ingest import (
        stateful_host_admitter,
        stream_domain_records,
    )

    land = tmp_path / "landing"
    land.mkdir()

    def rec(url):
        return json.dumps(
            {
                "domain_record": {
                    "filename": "f",
                    "url": url,
                    "offset": 0,
                    "length": 1,
                    "timestamp": "2023-01-01 10:00:00",
                },
                "additional_info": {},
            }
        )

    (land / "w1.jsonl").write_text(
        "\n".join(rec(f"https://a.com/{i}") for i in range(3))
        + "\n"
        + rec("https://b.com/0")
    )
    admitted = stateful_host_admitter(
        stream_domain_records(spark, str(land)), budget_per_host=5
    )
    q = (
        admitted.writeStream.format("memory")
        .queryName("t_admit")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from t_admit").collect()
        by_host = {}
        for r in rows:
            by_host.setdefault(r["host"], []).append(r["admit_seq"])
        assert sorted(by_host["a.com"]) == [1, 2, 3]
        assert sorted(by_host["b.com"]) == [1]

        # wave 2: 4 more a.com urls -> only seq 4,5 admitted (budget 5)
        (land / "w2.jsonl").write_text(
            "\n".join(rec(f"https://a.com/x{i}") for i in range(4))
        )
        q.processAllAvailable()
        rows2 = spark.sql("select * from t_admit").collect()
        a_seqs = sorted(r["admit_seq"] for r in rows2 if r["host"] == "a.com")
        assert a_seqs == [1, 2, 3, 4, 5], a_seqs
    finally:
        q.stop()


def test_ingest_to_catalog_exactly_once(spark, tmp_path):
    """foreachBatch -> CrawlCatalog append with batch-id idempotence:
    rows land once; a simulated replay of a committed batch is a no-op."""
    from cmoncrawl_spark.catalog import CrawlCatalog
    from cmoncrawl_spark.streaming.ingest import run_ingest_to_catalog

    land = tmp_path / "landing"
    land.mkdir()

    def rec(url):
        return json.dumps(
            {
                "domain_record": {
                    "filename": "f",
                    "url": url,
                    "offset": 0,
                    "length": 1,
                    "timestamp": "2023-01-01 10:00:00",
                },
                "additional_info": {},
            }
        )

    (land / "w1.jsonl").write_text(
        "\n".join(rec(f"https://a.com/{i}") for i in range(5))
    )
    cat = CrawlCatalog(spark, str(tmp_path / "wh"))
    q = run_ingest_to_catalog(
        spark, str(land), cat, checkpoint_dir=str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
        assert cat.read("ingested_records").count() == 5
        (land / "w2.jsonl").write_text(rec("https://b.com/x"))
        q.processAllAvailable()
        assert cat.read("ingested_records").count() == 6
    finally:
        q.stop()

    # the idempotence record lives INSIDE the committed snapshot entries
    # (no separate marker file => no crash window between data commit
    # and batch record)
    meta = cat._read_meta("ingested_records")
    committed_batches = [s.get("batch_id") for s in meta["snapshots"]]
    assert len(committed_batches) >= 2
    assert all(b is not None for b in committed_batches)

    # replaying an already-committed batch id directly must be a no-op
    before = cat.read("ingested_records").count()
    replay_df = spark.createDataFrame(
        [("https://dup.com/1", None, "f")],
        "url string, ts timestamp, filename string",
    )
    snap = cat.append("ingested_records", replay_df, batch_id=committed_batches[0])
    assert snap == meta["snapshots"][0]["id"]
    assert cat.read("ingested_records").count() == before
    # restart the stream from the same checkpoint: no duplicates
    q2 = run_ingest_to_catalog(
        spark, str(land), cat, checkpoint_dir=str(tmp_path / "ck")
    )
    try:
        q2.processAllAvailable()
        assert cat.read("ingested_records").count() == before
    finally:
        q2.stop()
