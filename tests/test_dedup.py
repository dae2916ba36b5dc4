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


def test_simhash_precision_dissimilar_docs_not_paired(spark):
    """Negative case: unrelated docs must NOT land within hamming<=3.
    (The pre-fix unsigned-underflow bug set every vote positive, giving
    simhash=-1 for every doc — recall tests alone couldn't see it.)"""
    from cmoncrawl_spark.operators.dedup import simhash, simhash_near_pairs

    import random

    rnd = random.Random(42)
    vocab_a = [f"alpha{i}" for i in range(200)]
    vocab_b = [f"beta{i}" for i in range(200)]
    rows = []
    for d in range(20):
        vocab = vocab_a if d % 2 == 0 else vocab_b
        rows.append((d, " ".join(rnd.choice(vocab) for _ in range(80))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hashes = {r["doc_id"]: r["simhash64"] for r in simhash(df).collect()}
    assert len(set(hashes.values())) > 1, "all simhashes identical"
    pairs = {(r["a"], r["b"]) for r in simhash_near_pairs(df, max_hamming=3).collect()}
    # cross-vocabulary pairs share no tokens; none should be near-dups
    cross = {(a, b) for (a, b) in pairs if a % 2 != b % 2}
    assert not cross, f"dissimilar docs paired: {sorted(cross)[:5]}"


def test_simhash_single_token_equals_token_hash(spark):
    """n=1 ground truth: the simhash of a one-token doc IS the token
    hash (every set bit wins 1-0)."""
    from pyspark.sql import functions as F

    from cmoncrawl_spark.functions.scalars import portable_hash64
    from cmoncrawl_spark.operators.dedup import simhash

    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    got = simhash(df, token_hash_fn=portable_hash64).first()["simhash64"]
    want = (
        spark.range(1)
        .select(portable_hash64(F.lit("solo")).alias("h"))
        .first()["h"]
    )
    assert got == want
