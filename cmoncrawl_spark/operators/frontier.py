"""Frontier scheduling round — the engine's flagship job (north_rule).

One round is a pure DataFrame job:

    canonicalize -> intra-batch dedup -> dedupe-against-seen (bloom +
    exact backstop) -> robots filter -> politeness budget ->
    per-host top-k (salted two-phase) -> deterministic fetch order

The reference's analog is the per-record loop in
/root/reference/cmoncrawl/middleware/synchronized.py:14-50 (URL-seen
gate at :30-41) plus its global Throttler
(cmoncrawl/common/throttling.py:8-43); politeness here is upgraded to a
per-host budget window per the north_rule (budget = floor(round_secs /
crawl_delay)) while keeping the reference's dedup semantics (D1).

Determinism (SURVEY §7 R1): every ordering is TOTAL — priority desc,
depth asc, then canonical url_id as the unique tiebreaker — so output
is bit-for-bit reproducible at any parallelism and matches the
single-threaded simulator oracle.

Scale design:
- canonicalization + ordering keys are native expressions (codegen);
- per-host top-k is TWO-PHASE: phase 1 ranks within (host, salt) so a
  hot host's candidates spread over ``salt_buckets`` reducers and are
  cut to <= budget rows EACH before phase 2's exact per-host rank —
  identical output to a single global window (phase-1 survivors are a
  superset of the true top-k), but the unsalted shuffle only carries
  O(hosts * salt_buckets * budget) rows instead of the raw skew (R4);
- the seen-set never moves: bloom shards are probed shard-local
  (bloom.py) and only bloom-positives reach the exact anti-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cmoncrawl_spark.functions.urls import host_of, unify_url_id_col
from cmoncrawl_spark.operators import bloom as bloom_ops

#: total-order sort keys for scheduling (best first).
def _order_keys() -> list[Column]:
    return [F.col("depth").asc(), F.col("priority").desc(), F.col("url_id").asc()]


def canonicalize(
    frontier: DataFrame,
    url_col: str = "url",
    domain_politeness: bool = False,
    domain_key_mode: str = "inline",
) -> DataFrame:
    """Attach url_id (D1 canonical id) + host — all codegen expressions.

    host (politeness key) = parse_url HOST (the hostname); url_id keys
    on the full netloc per the reference (urls._netloc_col) — the two
    differ only for port/userinfo URLs, where politeness should indeed
    group by hostname while the seen-id must match the reference.

    ``domain_politeness=True`` upgrades the politeness key to the PSL
    registered domain (eTLD+1): ``a.foo.co.uk`` and ``b.foo.co.uk``
    share foo.co.uk's budget while ``bar.co.uk`` stays separate —
    exact semantics of the index's url_host_registered_domain column
    (reference F1 DOMAIN match, athena_query_maker.py:10-33). Costs
    only broadcast joins against the tiny PSL table (functions/psl.py);
    hosts that ARE a public suffix keep the raw hostname key.

    ``domain_key_mode`` picks WHERE the PSL ladder runs (measured
    EQUAL within noise at 4.8M URLs/5k hosts on local[32] — both
    ~0.6 µs/URL over the host-keyed round; "inline" is the default
    for being stateless and cardinality-safe):

    - ``"distinct"``: ladder over ``SELECT DISTINCT host``,
      then BROADCAST the host -> domain map back onto the frontier.
      A scheduling round's frontier is host-clustered (politeness
      budgets only matter when hosts repeat), so the ladder touches
      |hosts| rows instead of |URLs| — at 19.2M amplified URLs / ~5k
      hosts that is a ~4000× cut in ladder work, and the frontier
      side sees ONE broadcast hash probe per row and no exchange.
      The broadcast hint is deliberate: without it Catalyst
      estimates the aggregate at input size, plans a sort-merge
      join, and the frontier pays a full shuffle+sort (measured 4×
      slower than inline at 50k rows). The distinct itself is cheap
      — partial (map-side) aggregation means its exchange carries
      per-partition-distinct hosts only.
    - ``"inline"``: ladder as row expressions on every URL — ZERO
      extra exchange AND zero driver-side state at any cardinality
      (measured ~0.2-0.3 µs/URL, domain_profile r5). The scale-safe
      choice when a frontier has ~no host repetition (|hosts| ~
      |URLs|, e.g. 10^8+ distinct hosts), where "distinct"'s map
      would outgrow a broadcast."""
    out = frontier.withColumn("host", host_of(F.col(url_col))).withColumn(
        "url_id", unify_url_id_col(F.col(url_col))
    )
    if domain_politeness:
        from cmoncrawl_spark.functions.psl import with_registered_domain

        if domain_key_mode == "distinct":
            hosts = out.select("host").distinct()
            rd_map = with_registered_domain(
                hosts, host_col="host", out_col="_rd"
            )
            out = out.join(F.broadcast(rd_map), on="host", how="left")
        elif domain_key_mode == "inline":
            out = with_registered_domain(out, host_col="host", out_col="_rd")
        else:
            raise ValueError(
                f"domain_key_mode must be 'distinct' or 'inline', "
                f"got {domain_key_mode!r}"
            )
        out = out.withColumn(
            "host", F.coalesce(F.col("_rd"), F.col("host"))
        ).drop("_rd")
    return out


def dedupe_intra_batch(candidates: DataFrame) -> DataFrame:
    """One row per url_id: keep the best (depth, priority desc, url) —
    the reference processes first-arrival only (synchronized.py:36)."""
    w = Window.partitionBy("url_id").orderBy(
        F.col("depth").asc(), F.col("priority").desc(), F.col("url").asc()
    )
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def per_host_topk(
    df: DataFrame,
    budget_col: str = "budget",
    salt_buckets: int = 16,
    budget_cap: int | None = None,
) -> DataFrame:
    """Salted two-phase per-host top-k under the total order.

    Output = rows with rank <= budget per host, plus their exact
    ``fetch_rank``. Equivalent to one Window.partitionBy(host) rank;
    survives hot-host skew (SURVEY §4 shuffle strategy, §7 R4).

    ``budget_cap`` (a CONSTANT upper bound on any host's budget, e.g.
    max over the policies table) additionally enables Spark's
    WindowGroupLimit: the rank filter becomes ``rn <= cap AND rn <=
    budget``, and the constant half is applied in Partial mode BEFORE
    the phase-1 exchange — a hot host ships at most cap rows per input
    partition per salt instead of its whole candidate set.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url_id")), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*_order_keys())
    cond1 = F.col("_rn1") <= F.col(budget_col)
    if budget_cap is not None:
        cond1 = (F.col("_rn1") <= F.lit(budget_cap)) & cond1
    phase1 = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .where(cond1)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy("host").orderBy(*_order_keys())
    return phase1.withColumn("fetch_rank", F.row_number().over(w2)).where(
        F.col("fetch_rank") <= F.col(budget_col)
    )


def scheduling_round(
    frontier: DataFrame,
    seen_ids: DataFrame | None,
    host_policies: DataFrame,
    bloom_shards: DataFrame | None = None,
    num_shards: int = 32,
    salt_buckets: int = 16,
    global_limit: int | None = None,
    budget_cap: int | None = None,
    domain_politeness: bool = False,
    domain_key_mode: str = "inline",
) -> DataFrame:
    """One full scheduling round.

    frontier:      url, depth:int, priority:double (+ passthrough cols)
    seen_ids:      url_id (canonical); None = PROVABLY no history
                   (a crawl's round 0) — the dedupe-against-seen stage
                   is an identity there and is omitted from the plan
                   outright (an anti-join against an empty set still
                   costs plan compile + an exchange-bearing subtree)
    host_policies: host, budget:int, robots_disallow_all:boolean
                   (broadcast — per-host table is tiny next to the
                   frontier even at 10^10 URLs); when
                   ``domain_politeness`` is set, keyed by PSL
                   registered domain instead of hostname.
    Returns the fetch list: url, url_id, host, depth, priority,
    budget, fetch_rank — deterministically ordered per host.
    """
    cand = canonicalize(
        frontier,
        domain_politeness=domain_politeness,
        domain_key_mode=domain_key_mode,
    )
    cand = dedupe_intra_batch(cand)
    if seen_ids is not None:
        cand = bloom_ops.dedupe_against_seen(
            cand, seen_ids, shards=bloom_shards, num_shards=num_shards
        )
    pol = host_policies.select("host", "budget", "robots_disallow_all")
    cand = cand.join(F.broadcast(pol), on="host", how="inner").where(
        ~F.col("robots_disallow_all")
    )
    # constant cap over all budgets -> enables pre-shuffle group limits.
    # Callers running many rounds against static policies pass it in;
    # otherwise one tiny driver-side agg (O(hosts)) derives it.
    if budget_cap is None:
        cap_row = host_policies.agg(F.max("budget")).first()
        budget_cap = (
            int(cap_row[0]) if cap_row and cap_row[0] is not None else None
        )
    out = per_host_topk(
        cand, salt_buckets=salt_buckets, budget_cap=budget_cap
    ).select(
        "url", "url_id", "host", "depth", "priority", "budget", "fetch_rank"
    )
    if global_limit is not None:
        out = out.orderBy(*_order_keys()).limit(global_limit)
    return out


def fetch_schedule(
    fetch_list: DataFrame,
    host_policies: DataFrame,
    default_delay: float = 1.0,
) -> DataFrame:
    """Turn per-host fetch ranks into concrete crawl-delay-spaced fetch
    offsets: the k-th fetch of a host starts (k-1) * crawl_delay_s
    seconds into the round — the per-host politeness contract made
    explicit (north_rule 'enforcing crawl-delay'). Broadcast join +
    one multiplication; integer milliseconds for hash-stable output.

    LEFT join: a scheduled host with no policy row (e.g. no robots.txt
    parsed — host_policies_from_robots only emits hosts it saw rules
    for) is still fetched, at ``default_delay`` (the same default that
    function uses); an inner join would silently DROP those URLs from
    the schedule."""
    pol = F.broadcast(host_policies.select("host", "crawl_delay_s"))
    delay = F.coalesce(F.col("crawl_delay_s"), F.lit(default_delay))
    return fetch_list.join(pol, on="host", how="left").withColumn(
        "fetch_offset_ms",
        ((F.col("fetch_rank") - 1) * delay * 1000).cast("long"),
    ).withColumn("crawl_delay_s", delay)


def opic_round(cash: DataFrame, links: DataFrame) -> DataFrame:
    """One OPIC cash-distribution round (Abiteboul/Preda/Cobena,
    "Adaptive On-Line Page Importance Computation", WWW'03) — the
    north_star's OPIC priority source.

    Every fetched page splits its cash equally over its outlinks; a
    target's received cash becomes (part of) its scheduling priority
    next round. Shapes: cash(url_id, cash_micro:long),
    links(src_id, dst_id). Returns (dst_id, cash_micro, in_links).

    Integer micro-cash units (floor division) keep the result exactly
    reproducible at any parallelism AND oracle-able — double summation
    order varies across engines. Plan: two shuffles (degree agg +
    receive agg), both map-side combinable; the cash join broadcasts
    when the fetched set is small, shuffle-hash at scale.
    """
    deg = links.groupBy("src_id").agg(F.count("*").alias("_deg"))
    shares = (
        links.join(deg, "src_id")
        .join(cash.withColumnRenamed("url_id", "src_id"), "src_id")
        .select(
            "dst_id",
            F.floor(F.col("cash_micro") / F.col("_deg"))
            .cast("long")
            .alias("share"),
        )
    )
    return shares.groupBy("dst_id").agg(
        F.sum("share").alias("cash_micro"),
        F.count("*").cast("int").alias("in_links"),
    )


def round_metrics(
    frontier: DataFrame,
    scheduled: DataFrame,
) -> DataFrame:
    """Per-host lineage metrics for the round (north_rule): candidates
    in, scheduled out, dropped counts."""
    cand = canonicalize(frontier).groupBy("host").agg(
        F.count("*").alias("candidates")
    )
    sched = scheduled.groupBy("host").agg(
        F.count("*").alias("scheduled"),
        F.min("fetch_rank").alias("min_rank"),
        F.max("fetch_rank").alias("max_rank"),
    )
    return (
        cand.join(sched, on="host", how="left")
        .withColumn("scheduled", F.coalesce(F.col("scheduled"), F.lit(0)))
        .withColumn(
            "dropped", F.col("candidates") - F.col("scheduled")
        )
    )
