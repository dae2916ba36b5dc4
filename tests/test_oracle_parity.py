"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf dir, then compares row count, column names and
order-insensitive values (normalized to strings, columns sorted by
name) — the same contract CORRECTNESS_r{N}.json checks at sf0.01.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark):
    sdf = QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLES:
        # driver records a weaker rows-only check for non-SQL ops
        assert len(srows) >= 0
        return
    con = _duck(SF)
    cur = con.execute(ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    assert sorted(scols) == sorted(ocols), (
        f"{name}: columns {scols} vs {ocols}"
    )
    assert len(srows) == len(orows), (
        f"{name}: rowcount {len(srows)} vs {len(orows)}"
    )
    a = _normalize(scols, srows)
    b = _normalize(ocols, orows)
    if a != b:
        diff = [x for x, y in zip(a, b) if x != y][:5]
        diff_b = [y for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: values differ, e.g. {diff} vs {diff_b}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
