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
