"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k vs a query vector;
  all-native double arithmetic (zip_with + aggregate), in-order fold
  so results are bit-reproducible (and oracle-able in DuckDB).
- :func:`signs_lsh` / :func:`cosine_dup_pairs` — random-hyperplane
  LSH bucketing for near-duplicate detection: deterministic seeded
  hyperplanes, bucket = sign-bit string, exact cosine verify within
  buckets. The O(n^2) pair space collapses to one groupBy(bucket).
- :func:`ann_topk` — LSH-bucketed approximate nearest neighbors: probe
  only the query's bucket (+ optional multi-probe), exact rerank
  inside. The 100 TB path: buckets are the partition key; a query
  touches one partition instead of the corpus.

No Python in any hot path — hyperplane dots are native expressions
generated from literal arrays (the hyperplanes are tiny: dim x bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _lcg_floats(n: int, seed: int = 11) -> list[float]:
    """Deterministic pseudo-normal floats via a seeded LCG (sum of 4
    uniforms, centered) — no RNG state, reproducible everywhere."""
    out = []
    x = seed
    for _ in range(n):
        acc = 0.0
        for _ in range(4):
            x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
            acc += x / float(1 << 63)
        out.append(acc - 2.0)
    return out


def hyperplanes(dim: int, bits: int, seed: int = 11) -> list[list[float]]:
    flat = _lcg_floats(dim * bits, seed)
    return [flat[i * dim : (i + 1) * dim] for i in range(bits)]


def dot(a: Column, b: Column) -> Column:
    """In-order double dot product (bit-reproducible fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Concatenated sign bits of the hyperplane dots — the LSH key."""
    bits = [
        F.when(
            dot(vec_col, F.array(*[F.lit(float(v)) for v in p])) >= 0, "1"
        ).otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


def _sign_bucket_py(vec: list[float], planes: list[list[float]]) -> str:
    """Python twin of :func:`sign_bucket` — same in-order double fold
    (acc += x*y left-to-right), so signs match Spark bit-for-bit."""
    out = []
    for p in planes:
        acc = 0.0
        for x, y in zip(vec, p):
            acc += x * y
        out.append("1" if acc >= 0 else "0")
    return "".join(out)


def _topk_ranked(sims: DataFrame, id_col: str, k: int) -> DataFrame:
    """Scale-safe top-k + rank over a (id, sim) DataFrame.

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject —
    per-partition k-row heaps merged on the driver, NO single-reducer
    global sort (the round-1 Window.orderBy plan shuffled the whole
    corpus into one partition). The rank window then sees only the k
    survivors; the two-key (sim desc, id asc) order preserves the
    deterministic tie-break, so output rows and ranks are identical.
    """
    top = sims.orderBy(F.col("sim").desc(), F.col(id_col).asc()).limit(k)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("sim").desc(), F.col(id_col))),
    )


def cosine_topk(
    vecs: DataFrame,
    query_vec: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    e = vecs.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_q", query_vec)
    sim = cosine(F.col("_v"), F.col("_q"))
    return _topk_ranked(e.select(F.col(id_col), sim.alias("sim")), id_col, k)


def cosine_dup_pairs(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    bits: int = 12,
    seed: int = 11,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Near-dup pairs (a < b) with exact cosine >= threshold, found via
    sign-LSH buckets. For thresholds near 1 the sign signature of the
    two vectors is (near-)identical, so bucket-equality recall is ~1;
    the exact verify inside buckets removes all false candidates.

    Degenerate-bucket guard: buckets over ``max_bucket_size`` (mass-
    duplicated embeddings — common for boilerplate pages) switch to
    star expansion via dedup._bounded_bucket_pairs, bounding candidates
    at O(m) per bucket while keeping duplicate-cluster connectivity;
    truncation is logged at INFO."""
    from cmoncrawl_spark.operators.dedup import _bounded_bucket_pairs

    sample = vecs.select(vec_col).first()
    dim = len(sample[0])
    planes = hyperplanes(dim, bits, seed)
    keyed = vecs.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", sign_bucket(F.col("v"), planes))
    cand = _bounded_bucket_pairs(
        keyed.select("id", "bucket"), ["bucket"], max_bucket_size
    )
    va = keyed.select(F.col("id").alias("a"), F.col("v").alias("va"))
    vb = keyed.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .where(sim >= threshold)
        .select("a", "b")
    )


def ivf_build(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    iters: int = 5,
    seed: int = 11,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF index: deterministic Lloyd's k-means over DataFrames.

    Centroid init is seeded-deterministic (LCG), every iteration is one
    broadcast-join + groupBy job (centroids stay driver-side — they're
    n_lists x dim floats, trivially broadcastable at any corpus size).
    Returns (assignments DataFrame [id, list_id], centroids).
    """
    dim = len(vecs.select(vec_col).first()[0])
    cents = hyperplanes(dim, n_lists, seed)  # reuse the seeded generator
    e = vecs.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = _assign(e, cents)
        rows = (
            assigned.groupBy("list_id")
            .agg(
                F.array(
                    *[
                        F.avg(F.element_at("v", i + 1)).alias(f"c{i}")
                        for i in range(dim)
                    ]
                ).alias("centroid"),
            )
            .collect()
        )
        new = list(cents)
        for r in rows:
            new[r["list_id"]] = [float(x) for x in r["centroid"]]
        cents = new
    return _assign(e, cents).select("id", "list_id"), cents


def _assign(e: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Nearest-centroid assignment as a pure expression argmin."""
    dists = [
        F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            F.lit(i).alias("i"),
        )
        for i, c in enumerate(cents)
    ]
    best = F.array_min(F.array(*dists))
    return e.withColumn("list_id", best["i"])


def ivf_topk(
    vecs: DataFrame,
    query_vec_values: list[float],
    centroids: list[list[float]],
    assignments: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF search: rank centroids driver-side, scan only the n_probe
    nearest lists, exact rerank inside. At scale the corpus is stored
    partitioned by list_id, so this reads n_probe partitions."""
    q = query_vec_values
    order = sorted(
        range(len(centroids)),
        key=lambda i: sum((a - b) ** 2 for a, b in zip(centroids[i], q)),
    )[:n_probe]
    qcol = F.array(*[F.lit(float(v)) for v in q])
    e = vecs.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).join(
        assignments.withColumnRenamed("id", id_col), on=id_col, how="inner"
    )
    cand = e.where(F.col("list_id").isin(order))
    sim = cosine(F.col("v"), qcol)
    return _topk_ranked(cand.select(F.col(id_col), sim.alias("sim")), id_col, k)


def ann_topk(
    vecs: DataFrame,
    query_vec_values: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 8,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: scan only the query's LSH bucket, exact
    rerank inside it. At scale the corpus is stored bucket-partitioned
    so this is a single-partition read (partition pruning)."""
    dim = len(query_vec_values)
    planes = hyperplanes(dim, bits, seed)
    qcol = F.array(*[F.lit(float(v)) for v in query_vec_values])
    keyed = vecs.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("bucket", sign_bucket(F.col("v"), planes))
    # query bucket driver-side in pure Python: planes are literals and
    # the in-order fold is the same IEEE sequence Spark's F.aggregate
    # runs, so no Spark job is needed for one constant
    qbucket = _sign_bucket_py([float(v) for v in query_vec_values], planes)
    cand = keyed.where(F.col("bucket") == qbucket)
    sim = cosine(F.col("v"), qcol)
    return _topk_ranked(cand.select(F.col(id_col), sim.alias("sim")), id_col, k)
