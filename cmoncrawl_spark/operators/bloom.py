"""Partitioned bloom-filter URL-seen set (SURVEY §2 D1, §7 R5).

The reference keeps an in-memory ``Set[str]`` of canonical URL ids
(/root/reference/cmoncrawl/middleware/synchronized.py:30-41). At a
10^10-URL frontier that set is ~12 GB of bloom bits at 1% FPR — far too
big to broadcast — so it is SHARDED by a hash of the url id: each shard
is an independent bloom filter (one blob row), built and probed
shard-locally via Arrow UDFs.

Zero per-row Python: the two independent 64-bit hashes every bloom op
needs are computed JVM-side with ``xxhash64(id)`` and
``xxhash64(id, seed=PRIME)`` inside whole-stage codegen; the pandas
UDFs receive plain int64 columns and do pure numpy bit math
(double-hashing h1 + i*h2 — Kirsch-Mitzenmacher).

Probe protocol (keeps results EXACT, not approximate):
  bloom-negative  -> definitely unseen, pass through (no join) — at
                     scale this is ~99% of candidates, so the expensive
                     exact join only sees bloom-positives;
  bloom-positive  -> exact left_anti join against the seen table to
                     eliminate false positives.
The net result equals an exact anti-join (the DuckDB oracle), with the
join input shrunk by orders of magnitude.

Checkpointing: shards serialize to rows (shard_id, bloom, n_items, m_bits,
k_hashes) — written/loaded as a parquet/Iceberg table per round
(north_rule resumability).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_SEED2 = 0x9E3779B1  # second-hash seed (golden-ratio prime)

BLOOM_SHARD_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType()),
        StructField("bloom", BinaryType()),
        StructField("n_items", LongType()),
        StructField("m_bits", LongType()),
        StructField("k_hashes", IntegerType()),
    ]
)


def optimal_params(n: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for n items at target false-positive rate."""
    n = max(n, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(len, k) bit positions via double hashing; all-numpy, vectorized."""
    i = np.arange(k, dtype=np.uint64)
    # uint64 wrap-around arithmetic is exactly what we want here.
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(bits, flat >> np.uint64(3), (1 << (flat & np.uint64(7))).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
    mask = (1 << (pos & np.uint64(7))).astype(np.uint8)
    return ((byte & mask) != 0).all(axis=1)


def with_bloom_hashes(df: DataFrame, id_col: str = "url_id") -> DataFrame:
    """Attach JVM-computed h1/h2 (int64) — the only hashing anywhere."""
    return df.withColumn("h1", F.xxhash64(F.col(id_col))).withColumn(
        "h2", F.xxhash64(F.col(id_col), F.lit(_SEED2))
    )


def shard_of(h1_col, num_shards: int):
    return F.pmod(h1_col, F.lit(num_shards)).cast("int")


def build_shards(
    seen_ids: DataFrame,
    num_shards: int = 32,
    expected_per_shard: int = 1_000_000,
    fpp: float = 0.01,
    id_col: str = "url_id",
) -> DataFrame:
    """Build bloom shards from a DataFrame of seen canonical ids.

    One shuffle (groupBy shard), then an Arrow UDF turns each shard's
    hash columns into one bloom blob row. Shard sizing is static from
    ``expected_per_shard`` — at scale you'd size from the seen-table
    row count (a cheap count on Iceberg metadata, no scan).
    """
    m, k = optimal_params(expected_per_shard, fpp)

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        h1 = pdf["h1"].to_numpy().astype(np.uint64)
        h2 = pdf["h2"].to_numpy().astype(np.uint64)
        _set_bits(bits, _positions(h1, h2, k, m))
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard"].iloc[0])],
                "bloom": [bits.tobytes()],
                "n_items": [len(pdf)],
                "m_bits": [m],
                "k_hashes": [k],
            }
        )

    # No .distinct(): bloom insertion is idempotent, so deduping first
    # would only add a shuffle.
    hashed = with_bloom_hashes(seen_ids.select(id_col), id_col)
    return (
        hashed.withColumn("shard", shard_of(F.col("h1"), num_shards))
        .groupBy("shard")
        .applyInPandas(_build, BLOOM_SHARD_SCHEMA)
    )


def probe(
    candidates: DataFrame,
    shards: DataFrame,
    num_shards: int = 32,
    id_col: str = "url_id",
) -> DataFrame:
    """Mark candidates with ``maybe_seen`` (bloom positive) per shard.

    Cogrouped Arrow UDF: each task gets one shard's candidates + that
    shard's blob row(s) — the full filter is never broadcast and
    never collected (R5). Output = candidates + maybe_seen:boolean.

    A shard may legitimately carry MULTIPLE blob rows:
    merge_bloom_shards groups by (shard_id, m_bits, k_hashes), so
    mixed-parameter histories keep one blob per parameterization.
    Membership is the OR over every blob row — probing only the first
    would produce silent false negatives (duplicate fetches).
    """
    out_schema = StructType(
        candidates.schema.fields + [StructField("maybe_seen", BooleanType())]
    )
    cand_cols = [f.name for f in candidates.schema.fields]

    def _probe(cand: pd.DataFrame, blob: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(columns=cand_cols + ["maybe_seen"])
        if blob.empty:
            res = cand[cand_cols].copy()
            res["maybe_seen"] = False
            return res
        h1 = cand["h1"].to_numpy().astype(np.uint64)
        h2 = cand["h2"].to_numpy().astype(np.uint64)
        seen = np.zeros(len(cand), dtype=bool)
        for _, row in blob.iterrows():
            bits = np.frombuffer(row["bloom"], dtype=np.uint8)
            m = int(row["m_bits"])
            k = int(row["k_hashes"])
            seen |= _test_bits(bits, _positions(h1, h2, k, m))
        res = cand[cand_cols].copy()
        res["maybe_seen"] = seen
        return res

    hashed = with_bloom_hashes(candidates, id_col).withColumn(
        "shard", shard_of(F.col("h1"), num_shards)
    )
    return (
        hashed.groupBy("shard")
        .cogroup(shards.groupBy(F.col("shard_id").alias("shard")))
        .applyInPandas(_probe, out_schema)
    )


def probe_positive_ids(
    candidates: DataFrame,
    shards: DataFrame,
    num_shards: int = 32,
    id_col: str = "url_id",
) -> DataFrame:
    """Bloom-positive ids only — the SLIM probe the dedup path uses.

    Only ``(id, h1, h2)`` enters the cogroup (three fixed-width
    columns; h1/h2 are numpy int64 end-to-end, no pandas object
    columns), and only the ~1%-at-scale positive ids come back out.
    Full candidate rows never cross the Arrow boundary — measured on
    this sandbox the full-width variant went superlinear at ~10^7 rows
    per level (object-dtype URL columns ballooning each cogroup group);
    the slim probe stays linear. Same shard-local protocol as
    :func:`probe` (full filter never broadcast / collected).
    """
    id_type = candidates.schema[id_col].dataType
    out_schema = StructType([StructField(id_col, id_type)])

    def _probe_pos(cand: pd.DataFrame, blob: pd.DataFrame) -> pd.DataFrame:
        if cand.empty or blob.empty:
            return pd.DataFrame({id_col: cand[id_col].iloc[0:0]})
        h1 = cand["h1"].to_numpy().astype(np.uint64)
        h2 = cand["h2"].to_numpy().astype(np.uint64)
        seen = np.zeros(len(cand), dtype=bool)
        for _, row in blob.iterrows():
            bits = np.frombuffer(row["bloom"], dtype=np.uint8)
            m = int(row["m_bits"])
            k = int(row["k_hashes"])
            seen |= _test_bits(bits, _positions(h1, h2, k, m))
        return pd.DataFrame({id_col: cand[id_col].to_numpy()[seen]})

    slim = with_bloom_hashes(candidates.select(id_col), id_col).withColumn(
        "shard", shard_of(F.col("h1"), num_shards)
    )
    return (
        slim.groupBy("shard")
        .cogroup(shards.groupBy(F.col("shard_id").alias("shard")))
        .applyInPandas(_probe_pos, out_schema)
    )


def dedupe_against_seen(
    candidates: DataFrame,
    seen_ids: DataFrame,
    shards: DataFrame | None = None,
    num_shards: int = 32,
    id_col: str = "url_id",
) -> DataFrame:
    """Exact unseen-set via bloom pre-filter + anti-join backstop.

    Equivalent to ``candidates.join(seen, 'left_anti')`` but the exact
    join only receives bloom-POSITIVE ids. With shards=None falls back
    to the plain exact anti-join (small inputs / tests).

    No ``.distinct()`` on the seen side (r6): semi- and anti-join are
    SET operations — duplicate seen ids cannot change their result —
    so the former dedup pass was one full shuffle+aggregate of the
    seen set per round for nothing (optimization guide §2.4, 'a
    distinct on data that is already unique').
    """
    seen = seen_ids.select(id_col)
    if shards is None:
        return candidates.join(seen, on=id_col, how="left_anti")
    if "fp_bits" in shards.columns:
        # cuckoo shards (operators/cuckoo.py) — same probe protocol,
        # deletable filter (north_rule "bloom/cuckoo" fallback).
        from cmoncrawl_spark.operators.cuckoo import probe_cuckoo

        probed = probe_cuckoo(
            candidates, shards, num_shards=num_shards, id_col=id_col
        )
        s = seen.withColumnRenamed(id_col, "_seen_id")
        return probed.join(
            s,
            (F.col(id_col) == F.col("_seen_id")) & F.col("maybe_seen"),
            "left_anti",
        ).drop("maybe_seen")
    # Bloom path (round 3): slim probe -> exact confirm -> one anti
    # join. positives ∩ seen is exactly candidates ∩ seen (the bloom
    # has no false negatives), so anti-joining candidates against the
    # CONFIRMED hits equals the exact anti-join — while the shuffled /
    # Arrow-transferred intermediates shrink from full rows to single
    # id columns. The confirm join and the final anti-join both
    # broadcast whenever their small side allows (AQE decides).
    pos = probe_positive_ids(
        candidates, shards, num_shards=num_shards, id_col=id_col
    )
    hits = pos.join(seen, on=id_col, how="left_semi")
    return candidates.join(hits, on=id_col, how="left_anti")
