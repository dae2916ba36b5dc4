"""Cuckoo-filter fallback: same probe contract as bloom + DELETION
(the one operation bloom bits can't do — the point of the fallback)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cmoncrawl_spark.datagen import register_crawl_views
from cmoncrawl_spark.operators import bloom as bloom_ops
from cmoncrawl_spark.operators import cuckoo as ck
from cmoncrawl_spark.operators.frontier import canonicalize


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


def test_cuckoo_no_false_negatives(spark, sf_dir):
    register_crawl_views(spark, sf_dir)
    seen = _seen(spark)
    shards = ck.build_cuckoo_shards(seen, num_shards=8, expected_per_shard=1000)
    probed = ck.probe_cuckoo(seen, shards, num_shards=8)
    n = probed.count()
    pos = probed.where("maybe_seen").count()
    assert n > 0 and pos == n


def test_cuckoo_dedupe_equals_exact_antijoin(spark, sf_dir):
    """dedupe_against_seen with cuckoo shards == exact anti-join —
    the same equivalence the bloom path guarantees."""
    cand = canonicalize(_frontier(spark, sf_dir))
    seen = _seen(spark)
    shards = ck.build_cuckoo_shards(seen, num_shards=8, expected_per_shard=1000)
    exact = set(
        r["url"]
        for r in cand.join(seen, "url_id", "left_anti").select("url").collect()
    )
    with_cuckoo = set(
        r["url"]
        for r in bloom_ops.dedupe_against_seen(cand, seen, shards, num_shards=8)
        .select("url")
        .collect()
    )
    assert with_cuckoo == exact


def test_cuckoo_probe_multi_blob_shards(spark):
    """Shards with multiple table rows per shard_id (e.g. different
    n_buckets merged across rounds): membership = OR over all rows."""
    a = [f"hosta.com/p{i}x" for i in range(150)]
    b = [f"hostb.org/q{i}y" for i in range(150)]
    a_df = spark.createDataFrame([(u,) for u in a], "url_id string")
    b_df = spark.createDataFrame([(u,) for u in b], "url_id string")
    shards = ck.build_cuckoo_shards(
        a_df, num_shards=4, expected_per_shard=200
    ).unionByName(
        ck.build_cuckoo_shards(b_df, num_shards=4, expected_per_shard=1000)
    )
    both = a_df.unionByName(b_df)
    pos = ck.probe_cuckoo(both, shards, num_shards=4).where("maybe_seen").count()
    assert pos == len(a) + len(b)


def test_cuckoo_delete_then_probe(spark):
    """Insert A ∪ B, delete B: A stays positive (no false negatives for
    retained items barring fp-collisions), B probes negative again."""
    a = [f"hosta.com/path{i}x" for i in range(300)]
    b = [f"hostb.org/deep/page{i}y" for i in range(200)]
    df = spark.createDataFrame([(u,) for u in a + b], "url_id string")
    shards = ck.build_cuckoo_shards(df, num_shards=4, expected_per_shard=500)

    del_df = spark.createDataFrame([(u,) for u in b], "url_id string")
    updated = ck.delete_from_cuckoo_shards(shards, del_df, num_shards=4)

    a_df = spark.createDataFrame([(u,) for u in a], "url_id string")
    b_df = spark.createDataFrame([(u,) for u in b], "url_id string")
    a_pos = ck.probe_cuckoo(a_df, updated, num_shards=4).where("maybe_seen").count()
    b_pos = ck.probe_cuckoo(b_df, updated, num_shards=4).where("maybe_seen").count()
    assert a_pos == len(a), f"retained items lost: {a_pos}/{len(a)}"
    # deleted items must drop out (fp collisions could retain a few at
    # 16-bit fingerprints; with these sizes the expected count is 0)
    assert b_pos == 0, f"{b_pos} deleted items still positive"
    # and the original filter (no deletes) still sees all of B
    assert (
        ck.probe_cuckoo(b_df, shards, num_shards=4).where("maybe_seen").count()
        == len(b)
    )


def test_cuckoo_high_load_build():
    """Driver-side unit: inserts up to the sizing load factor succeed
    and all items remain probe-positive (eviction loop correctness)."""
    import numpy as np

    n = 1000
    n_buckets = ck._n_buckets_for(n)
    table = np.zeros((n_buckets, ck.SLOTS), dtype=np.uint16)
    rng = np.random.default_rng(7)
    h1 = rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
    h2 = rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
    fp = ck._fingerprints(h2)
    i1 = h1 & np.uint64(n_buckets - 1)
    uniq = np.unique(np.stack([i1, fp.astype(np.uint64)], axis=1), axis=0)
    ck._insert_all(table, uniq[:, 0], uniq[:, 1].astype(np.uint16), n_buckets)
    member = ck._membership(table, n_buckets, h1, h2)
    assert member.all()
