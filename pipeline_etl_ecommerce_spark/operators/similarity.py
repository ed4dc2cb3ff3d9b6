"""Similarity search over embedding columns (``array<float>``).

Two paths:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query set × corpus cross join; dot products via ``F.aggregate`` over
  zipped arrays (JVM-side, no Python). Use only with a bounded query set.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH signatures
  bucket the corpus; candidates come from a bucket equi-join, then exact
  cosine re-ranks within buckets. At 100 TB the cross join disappears; the
  shuffle key is the bucket signature.

Cosine is computed in double precision with a fixed left-to-right summation
(array order), so results are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def embedding_norms(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    v = _dvec(F.col(vec_col))
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.size(F.col(vec_col)).alias("dim"),
        F.round(norm(v), 6).alias("l2_norm"),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self-matches).

    queries: same schema as corpus; keep it small (broadcast side)."""
    q = queries.select(F.col(id_col).alias("query_id"), _dvec(F.col(vec_col)).alias("qv"))
    c = corpus.select(F.col(id_col).alias("cand_id"), _dvec(F.col(vec_col)).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rnk").cast("int").alias("rnk"))
    )


def margin_mined_pairs(
    side_a: DataFrame,
    side_b: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    tau: float = 1.1,
) -> DataFrame:
    """Margin-based bitext mining (r9) — the CCMatrix/LASER alignment rule
    (Artetxe & Schwenk 2019, "Margin-based Parallel Corpus Mining"):
    absolute cosine is uncalibrated across embedding neighborhoods, so a
    pair (x ∈ A, y ∈ B) is scored by its margin over both local
    neighborhoods,

        margin(x, y) = 2·cos(x, y) / (avg_k cos(x, NN_B(x)) + avg_k cos(y, NN_A(y)))

    and x keeps its best-margin candidate when ``margin >= tau``. Returns
    one row per mined source: ``(src_id, tgt_id, cos_sim, margin)``.

    Plan: forward/backward exact kNN via :func:`cosine_topk` (the bounded
    broadcast baseline — at corpus scale swap BOTH kNN legs for the IVF
    sublinear lists, ``operators.ivf``; the margin algebra downstream is
    unchanged and joins only k-row-per-query tables), per-side neighborhood
    averages, margin + per-source argmax over the k-bounded candidate set.
    Cosines and margins round to 6dp (the decontamination convention) so
    the oracle's float algebra agrees."""
    fwd = cosine_topk(side_b, side_a, vec_col=vec_col, id_col=id_col, k=k)
    bwd = cosine_topk(side_a, side_b, vec_col=vec_col, id_col=id_col, k=k)
    ax = fwd.groupBy("query_id").agg(F.avg("cos_sim").alias("__ax"))
    ay = (
        bwd.groupBy("query_id")
        .agg(F.avg("cos_sim").alias("__ay"))
        .withColumnRenamed("query_id", "cand_id")
    )
    m = (
        fwd.join(ax, "query_id")
        .join(ay, "cand_id")
        .withColumn(
            "margin",
            F.round(2 * F.col("cos_sim") / (F.col("__ax") + F.col("__ay")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("margin").desc(), F.col("cand_id"))
    return (
        m.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("margin") >= tau))
        .select(
            F.col("query_id").alias("src_id"),
            F.col("cand_id").alias("tgt_id"),
            "cos_sim",
            "margin",
        )
    )


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH: one bit per plane (sign of the dot product),
    packed into a string key. Planes are plain Python floats baked into the
    plan as literals — deterministic and broadcast-free."""
    bits = []
    for p in planes:
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in p]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; exact
    cosine re-ranks them. Recall depends on the plane count (more planes →
    smaller buckets → faster + lower recall)."""
    sig_c = corpus.select(
        F.col(id_col).alias("cand_id"),
        _dvec(F.col(vec_col)).alias("cv"),
        hyperplane_signature(_dvec(F.col(vec_col)), planes).alias("bucket"),
    )
    sig_q = queries.select(
        F.col(id_col).alias("query_id"),
        _dvec(F.col(vec_col)).alias("qv"),
        hyperplane_signature(_dvec(F.col(vec_col)), planes).alias("bucket"),
    )
    scored = (
        sig_q.join(sig_c, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rnk").cast("int").alias("rnk"))
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    planes: list[list[float]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection at corpus scale: vectors
    sharing a hyperplane-LSH bucket are candidates (nearby vectors land on
    the same side of most planes), exact cosine filters at ``threshold``.
    All-pairs within buckets — quadratic only per bucket, like the MinHash
    band join."""
    # norm once per VECTOR in the signature stage, not once per PAIR in the
    # bucket join — the pair stage then does a single dot product + divide
    # (identical floating-point arithmetic, so oracle parity is preserved)
    sig = corpus.select(
        F.col(id_col).alias("vid"),
        _dvec(F.col(vec_col)).alias("v"),
        hyperplane_signature(_dvec(F.col(vec_col)), planes).alias("bucket"),
    ).withColumn("nv", norm(F.col("v")))
    a = sig.select(F.col("bucket"), F.col("vid").alias("vec_a"), F.col("v").alias("va"), F.col("nv").alias("na"))
    b = sig.select(F.col("bucket"), F.col("vid").alias("vec_b"), F.col("v").alias("vb"), F.col("nv").alias("nb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def random_projection(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    planes: list[list[float]],
    *,
    round_to: int = 6,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each
    embedding onto ``planes`` (one output component per plane, the same
    pinned-literal matrix recipe as ``hyperplane_signature`` — the LSH
    signature is exactly the SIGN of this projection). Emits one
    ``p{i}`` column per plane, rounded for cross-engine determinism.

    Scale shape: pure map-side codegen (literal matrix baked into the
    plan, no broadcast, no shuffle) — reduces a 100 TB embedding table to
    k columns in a single scan, which is what makes downstream clustering
    / ANN cheap enough to iterate on.
    """
    v = _dvec(F.col(vec_col))
    outs = [
        F.round(
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(x) for x in p]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, w: acc + w,
            ),
            round_to,
        ).alias(f"p{i}")
        for i, p in enumerate(planes)
    ]
    return df.select(F.col(id_col).alias("vec_id"), *outs)
