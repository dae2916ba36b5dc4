"""Dedup + similarity operator tests (sf0.001 for speed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cmoncrawl_spark.queries import _docs2
from cmoncrawl_spark.session import load_tables


def test_minhash_finds_planted_pairs(spark, sf_dir):
    from cmoncrawl_spark.operators.dedup import minhash_dedup_pairs

    docs2 = _docs2(spark, sf_dir)
    pairs = minhash_dedup_pairs(docs2, threshold=0.6)
    found = {(r["a"], r["b"]) for r in pairs.collect()}
    n_docs = docs2.count() // 2
    # every planted (d, d+1e6) pair with enough words must be found
    planted = {
        (r["doc_id"], r["doc_id"] + 1000000)
        for r in spark.table("documents")
        .where(F.size(F.split("text", " ")) >= 20)
        .collect()
    }
    missing = planted - found
    assert not missing, f"missed {len(missing)} of {len(planted)}"


def test_simhash_near_pairs_find_mutants(spark, sf_dir):
    from cmoncrawl_spark.operators.dedup import simhash_near_pairs

    docs2 = _docs2(spark, sf_dir)
    pairs = simhash_near_pairs(docs2, max_hamming=6)
    found = {(r["a"], r["b"]) for r in pairs.collect()}
    # long docs: dropping 2 words flips few simhash bits
    long_docs = {
        r["doc_id"]
        for r in spark.table("documents")
        .where(F.size(F.split("text", " ")) >= 60)
        .collect()
    }
    planted = {(d, d + 1000000) for d in long_docs}
    hit = len(planted & found) / max(len(planted), 1)
    assert hit >= 0.8, f"simhash recall {hit:.2f} on long docs"


def test_simhash_deterministic(spark, sf_dir):
    from cmoncrawl_spark.operators.dedup import simhash

    a = {(r["doc_id"], r["simhash64"]) for r in simhash(_docs2(spark, sf_dir)).collect()}
    b = {(r["doc_id"], r["simhash64"]) for r in simhash(_docs2(spark, sf_dir).repartition(7)).collect()}
    assert a == b


def test_ann_topk_contains_self(spark, sf_dir):
    from cmoncrawl_spark.operators.similarity import ann_topk

    load_tables(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    qv = emb.where("vec_id = 3").first()["embedding"]
    res = ann_topk(emb, [float(x) for x in qv], k=5)
    rows = res.collect()
    assert rows, "query bucket empty"
    assert rows[0]["vec_id"] == 3 and rows[0]["rank"] == 1


def test_exact_topk_matches_ann_rerank(spark, sf_dir):
    """ANN's bucket-restricted ranks must be consistent with exact sims."""
    from cmoncrawl_spark.operators.similarity import cosine_topk

    load_tables(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    qv = emb.where("vec_id = 0").select(
        F.col("embedding").cast("array<double>")
    ).first()[0]
    res = cosine_topk(emb, F.array(*[F.lit(float(v)) for v in qv]), k=5).collect()
    assert res[0]["vec_id"] == 0  # self is nearest
    sims = [r["sim"] for r in res]
    assert sims == sorted(sims, reverse=True)
