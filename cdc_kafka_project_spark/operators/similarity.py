"""Similarity search over embedding columns (north-star extension).

Embeddings are plain ``array<float>`` columns; all vector math uses
JVM-side higher-order functions in float64 (functions.dot/cosine_sim) —
no UDF, no Python in the scan.

Two tiers:

* **brute force** — query-vs-all cosine + top-k. At 100 TB this is a
  single scan with a TakeOrderedAndProject (per-partition heaps), which
  is exactly how a distributed flat index behaves; still the recall=1.0
  baseline every ANN variant is judged against.
* **LSH (random hyperplanes)** — sign-pattern bucketing. Probing only
  matching (or near-matching) buckets turns query-vs-all into an
  equi-join. An IVF variant (k-means coarse quantizer via pyspark.ml)
  is the planned upgrade; the bucketing/probing plumbing is identical.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, functions as F

from cdc_kafka_project_spark.functions import cosine_sim, l2_norm, to_double_array


def query_vector(embeddings: DataFrame, vec_id: int) -> list[float]:
    """Fetch one embedding to the driver to use as the query point.

    This is a deliberate driver-side lookup of a single O(dim) row —
    the query, not the data.
    """
    row = embeddings.filter(F.col("vec_id") == vec_id).select("embedding").head()
    if row is None:
        raise KeyError(f"vec_id {vec_id} not found")
    return list(row[0])


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 20,
    round_to: int | None = 4,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query vector is a literal array (broadcast with the plan); the
    scan computes one fused expression per row and TakeOrderedAndProject
    keeps k rows per partition — no shuffle of the corpus.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = cosine_sim(F.col("embedding"), q)
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        embeddings.select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def lsh_bucket_expr(col, planes: list[list[float]]):
    """Sign-pattern bucket id (0..2^n_planes-1) for an embedding column."""
    from cdc_kafka_project_spark.functions import dot

    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot(to_double_array(col), pl) > 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 20,
    n_planes: int = 8,
    probe_hamming: int = 1,
    round_to: int | None = 4,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket filter, then exact cosine.

    Scans only rows whose bucket is within ``probe_hamming`` bit flips
    of the query's bucket (multi-probe). With 8 planes + 1-bit probing
    that's ~3.5% of the corpus in expectation — the 100 TB path, at the
    cost of bounded recall loss (measured in tests against brute force).
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) > 0:
            qbits |= 1 << i
    probe = [qbits] + (
        [qbits ^ (1 << i) for i in range(n_planes)] if probe_hamming >= 1 else []
    )
    bucketed = embeddings.withColumn(
        "__bucket", lsh_bucket_expr(F.col("embedding"), planes)
    )
    cand = bucketed.filter(F.col("__bucket").isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = cosine_sim(F.col("embedding"), q)
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        cand.select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def embedding_norms(embeddings: DataFrame, round_to: int = 4) -> DataFrame:
    """Per-vector L2 norm + dimensionality (sanity/quality scan)."""
    arr = to_double_array(F.col("embedding"))
    return embeddings.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(l2_norm(arr), round_to).alias("l2_norm"),
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    round_to: int | None = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH-bucketed self-join.

    Same-bucket pairs only (near-identical vectors land together with
    high probability), then exact cosine verification — the
    embedding-space twin of MinHash-LSH + Jaccard-verify.
    """
    dim = int(embeddings.select(F.size("embedding")).head()[0])
    planes = _hyperplanes(dim, n_planes)
    bucketed = embeddings.select(
        "vec_id",
        "embedding",
        lsh_bucket_expr(F.col("embedding"), planes).alias("__bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__bucket") == F.col("b.__bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = cosine_sim(F.col("a.embedding"), F.col("b.embedding"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
