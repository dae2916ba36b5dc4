"""Structured Streaming ingest (SURVEY §2.8 note, R6).

The reference has NO event-time streaming — its "streaming" is asyncio
flow control, and scheduling rounds are deliberately batch jobs
(SURVEY §7 R6: don't invent watermark semantics the reference lacks).

What a production deployment DOES stream is ingest: newly-fetched
pages landing as files which must be appended to the pages table and
counted per host. This module gives that path real Structured
Streaming shape:

- file-source `readStream` with the declared domain-record schema;
- event-time windowed per-host counts with a watermark (late pages
  join the next window, mirroring "late URLs enter the next round");
- `foreachBatch` append into the round StateStore (exactly-once per
  micro-batch via the same commit protocol).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cmoncrawl_spark.functions.urls import host_of
from cmoncrawl_spark.sources.jsonl import JSONL_SCHEMA


def stream_domain_records(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a landing directory of domain-record JSONL."""
    raw = spark.readStream.schema(JSONL_SCHEMA).json(path)
    return raw.select(
        F.col("domain_record.url").alias("url"),
        F.col("domain_record.timestamp").alias("ts"),
        F.col("domain_record.filename").alias("filename"),
    )


def hostwise_ingest_counts(
    records: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed per-host arrival counts with a watermark."""
    return (
        records.withColumn("host", host_of(F.col("url")))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("host"))
        .agg(F.count("*").alias("n_records"))
        .select(
            F.col("win.start").alias("window_start"),
            "host",
            "n_records",
        )
    )


def stateful_host_admitter(
    records: DataFrame,
    budget_per_host: int = 100,
) -> DataFrame:
    """Custom stateful operator: per-host CUMULATIVE admission budget
    across micro-batches (applyInPandasWithState).

    The windowed agg above forgets between windows; a crawl's politeness
    ledger must not — each host carries a running admitted-count, and a
    URL is admitted only while the ledger is under budget. State =
    one int per host, updated per micro-batch; emitted rows carry the
    1-based admit_seq. This is the streaming twin of the batch round's
    per-host top-k, with GroupState replacing the window.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def admit(key, pdfs, state: GroupState):
        (host,) = key
        n = state.get[0] if state.exists else 0
        out = []
        for pdf in pdfs:
            for url in pdf["url"]:
                if n < budget_per_host:
                    n += 1
                    out.append((host, url, n))
        state.update((n,))
        yield pd.DataFrame(out, columns=["host", "url", "admit_seq"])

    keyed = records.withColumn("host", host_of(F.col("url")))
    return keyed.groupBy("host").applyInPandasWithState(
        admit,
        outputStructType="host string, url string, admit_seq int",
        stateStructType="admitted int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_ingest_to_catalog(
    spark: SparkSession,
    path: str,
    catalog,
    table: str = "ingested_records",
    checkpoint_dir: str | None = None,
):
    """Production ingest sink: foreachBatch appends each micro-batch to
    a CrawlCatalog table, EXACTLY-ONCE via batch-id idempotence — a
    replayed micro-batch (restart between sink write and offset commit)
    finds its batch id already recorded and skips. The batch id lives
    INSIDE the snapshot commit itself (CrawlCatalog.append's atomic
    meta replace / Iceberg snapshot summary), so there is no crash
    window between the data commit and the idempotence record."""
    catalog.create_table(table, "url string, ts timestamp, filename string")

    def _append(batch_df, batch_id: int) -> None:
        catalog.append(table, batch_df, batch_id=batch_id)

    records = stream_domain_records(spark, path)
    writer = records.writeStream.foreachBatch(_append)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def run_ingest_to_memory(
    spark: SparkSession,
    path: str,
    query_name: str = "ingest_counts",
):
    """Start the stream into a memory sink (tests); returns the query.

    Production swaps the sink for ``foreachBatch`` appending to the
    pages table + StateStore — the aggregation plan is identical.
    """
    counts = hostwise_ingest_counts(stream_domain_records(spark, path))
    return (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )
