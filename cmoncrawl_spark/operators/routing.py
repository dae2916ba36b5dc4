"""Route matching (SURVEY §2 J1) — regex + validity-interval dispatch.

The reference scans registered routes in registration order and the
first route whose regex matches the url AND whose [since, to) interval
contains the timestamp wins; no match raises
(/root/reference/cmoncrawl/processor/pipeline/router.py:141-168).

Spark-first: the route table is tiny and static, so the whole dispatch
compiles to a single CASE WHEN expression chain (pure Catalyst,
whole-stage codegen, no UDF, no join, no shuffle). First-match-wins
order is preserved by CASE WHEN evaluation order. A broadcast-join
variant is provided for very large route sets.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class Route:
    """Reference Route struct (router.py:23-28): name + url regexes +
    validity interval (None = open)."""

    name: str
    regexes: list[str]
    since: datetime | None = None
    to: datetime | None = None


def route_expr(
    routes: list[Route],
    url_col: Column,
    ts_col: Column,
    no_match: str | None = None,
) -> Column:
    """First-match-wins dispatch as one CASE WHEN chain.

    ``no_match=None`` yields NULL for unrouted rows (caller decides —
    the reference raises; a DataFrame job filters or fails on
    ``route IS NULL``).
    """
    expr: Column | None = None
    chain = []
    for r in routes:
        cond = None
        for rx in r.regexes:
            c = url_col.rlike(rx)
            cond = c if cond is None else (cond | c)
        if cond is None:
            continue
        if r.since is not None:
            cond = cond & (ts_col >= F.lit(r.since))
        if r.to is not None:
            cond = cond & (ts_col < F.lit(r.to))
        chain.append((cond, r.name))
    if not chain:
        return F.lit(no_match)
    expr = F.when(chain[0][0], F.lit(chain[0][1]))
    for cond, name in chain[1:]:
        expr = expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit(no_match))


def route_records(
    records: DataFrame,
    routes: list[Route],
    url_col: str = "url",
    ts_col: str = "warc_ts",
    out_col: str = "route",
    no_match: str | None = None,
) -> DataFrame:
    return records.withColumn(
        out_col, route_expr(routes, F.col(url_col), F.col(ts_col), no_match)
    )


def route_records_join(
    records: DataFrame,
    routes_df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Broadcast nested-loop variant for large route tables.

    routes_df: (route_idx int, name string, regex string,
    since timestamp?, to timestamp?). First match by route_idx wins via
    a per-record row_number — same contract, join-shaped.
    """
    r = F.broadcast(routes_df)
    # A synthetic per-row id (not all record columns) keys the first-match
    # window: duplicate input rows keep their multiplicity, and the window
    # partitions on one long instead of the whole row.
    recs = records.withColumn("_rec_id", F.monotonically_increasing_id())
    joined = recs.join(
        r,
        F.col(url_col).rlike(F.col("regex"))
        & (F.col("since").isNull() | (F.col(ts_col) >= F.col("since")))
        & (F.col("to").isNull() | (F.col(ts_col) < F.col("to"))),
        "left",
    )
    w = Window.partitionBy(F.col("_rec_id")).orderBy(
        F.col("route_idx").asc_nulls_last()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_rec_id", "regex", "since", "to", "route_idx")
        .withColumnRenamed("name", "route")
    )
