"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs:

* ``cosine_topk`` — exact brute-force: broadcast the (small) query side
  against the full embeddings table; dot products via ``F.aggregate`` /
  ``F.zip_with`` (JVM-side, codegen'd — no Python in the hot path); window
  top-k.  The correctness baseline and the right plan whenever the query
  batch is small (the data side streams, nothing shuffles but the top-k).
* ``lsh_topk`` — random-hyperplane LSH bucketing: sign-bit sketches over H
  fixed hyperplanes (seeded, deterministic) → candidates share a bucket →
  exact cosine re-rank inside buckets.  Sub-linear candidate generation for
  query batches too large to broadcast.  Approximate: recall measured in
  tests, not guaranteed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # cast to double BEFORE multiplying: float32 inputs otherwise produce
    # sums that differ from a float64 oracle by ~1e-8, enough to straddle
    # rounding boundaries
    return F.aggregate(
        F.zip_with(
            a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    embeddings: DataFrame,
    query_vecs: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    → (query_id, rank, vec_id, cos) ; self-matches excluded; ties break on
    ascending vec_id (rounded-cos comparator, same determinism rule as BM25).
    """
    q = query_vecs.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("vec"), F.col("qvec"))
                / (_norm(F.col("vec")) * _norm(F.col("qvec"))),
                decimals,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cos")
    )


QUANT_SCALE = 1000  # embedding → integer quantization for exact sign tests


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[int]]:
    """Seeded random hyperplanes with small-INTEGER components (±4 uniform).

    Integer planes ⊗ floor-quantized embeddings make every bucket bit an
    exact integer sign test — deterministic across engines (an oracle can
    inline the planes as SQL literals and reproduce the buckets exactly),
    unlike float projections whose summation-order noise can flip a
    near-zero sign.  Statistically they remain random hyperplanes: direction
    is what matters for sign-sketch LSH, and ±4 integer directions cover the
    sphere densely enough at these dims (recall measured in tests/test_ann).
    """
    rng = np.random.default_rng(seed)
    return rng.integers(-4, 5, size=(n_planes, dim)).tolist()


def _quantized(vec_col: str):
    """array<float> → array<long>: floor(x·1000) per component (exact and
    identical in Spark and DuckDB for the same double input)."""
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(QUANT_SCALE))).cast("long"),
    )


def _idot(a, b):
    """Integer dot product (no casts — inputs already integral)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, v: s + v
    )


def with_lsh_bucket(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    seed: int = 42,
    n_tables: int = 1,
) -> DataFrame:
    """Random-hyperplane sign-sketch buckets (JVM-side INTEGER dot products —
    see _hyperplanes for why quantized).

    n_tables > 1 → the standard multi-table LSH construction: one row per
    (item, table_id) with that table's bucket; candidates co-bucket in ANY
    table.  Recall rises as 1−(1−p^planes)^tables at linear cost in rows.
    """
    planes = _hyperplanes(dim, n_planes * n_tables, seed)
    qv = _quantized(vec_col)
    buckets = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for i in range(n_planes):
            p = planes[t * n_planes + i]
            plane = F.array(*[F.lit(int(x)).cast("long") for x in p])
            bit = (_idot(qv, plane) > 0).cast("long")
            bucket = bucket + F.shiftleft(bit, i)
        buckets.append(bucket)
    if n_tables == 1:
        return embeddings.withColumn("bucket", buckets[0]).withColumn(
            "table_id", F.lit(0)
        )
    return embeddings.select(
        "*", F.posexplode(F.array(*buckets)).alias("table_id", "bucket")
    )


def lsh_topk(
    embeddings: DataFrame,
    query_vecs: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates co-bucket in ≥ 1 LSH table, exact re-rank.

    The (table_id, bucket) equi-join replaces the cross join — at scale the
    shuffle is by bucket key and each task sees one bucket's candidates only.
    """
    e = with_lsh_bucket(
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")),
        dim, n_planes, "vec", n_tables=n_tables,
    )
    q = with_lsh_bucket(
        query_vecs.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        dim, n_planes, "qvec", n_tables=n_tables,
    )
    scored = (
        e.join(q, ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("vec_id", "query_id", "vec", "qvec")
        .distinct()
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("vec"), F.col("qvec"))
                / (_norm(F.col("vec")) * _norm(F.col("qvec"))),
                decimals,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cos")
    )


def _centroids(dim: int, n_centroids: int, seed: int = 43) -> list[list[int]]:
    """Seeded integer 'centroids' for the IVF cells — same quantized-integer
    determinism rationale as _hyperplanes.  A production IVF would train
    these with k-means over a sample; the OPERATOR (cell assignment →
    probe-limited candidate join → exact re-rank) is identical either way,
    and fixed random directions are the standard training-free baseline."""
    rng = np.random.default_rng(seed)
    return rng.integers(-4, 5, size=(n_centroids, dim)).tolist()


def _ivf_cells(vec_col: str, dim: int, n_centroids: int, n_probe: int, seed: int = 43):
    """array<int> of the n_probe nearest cell ids (by integer dot product,
    descending; ties → smaller id — array_sort over (−dot, id) structs)."""
    qv = _quantized(vec_col)
    cents = _centroids(dim, n_centroids, seed)
    entries = [
        F.struct(
            (-_idot(qv, F.array(*[F.lit(int(x)).cast("long") for x in c]))).alias("nd"),
            F.lit(j).alias("j"),
        )
        for j, c in enumerate(cents)
    ]
    ranked = F.slice(F.array_sort(F.array(*entries)), 1, n_probe)
    return F.transform(ranked, lambda s: s["j"])


def ivf_topk(
    embeddings: DataFrame,
    query_vecs: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
    seed: int = 43,
) -> DataFrame:
    """IVF approximate top-k: data vectors live in ONE cell (their nearest
    centroid); each query probes its n_probe nearest cells; candidates are
    the probed cells' members, re-ranked by exact cosine.

    At scale: the cell column partitions the vector table (a real deployment
    would bucket/partition parquet by it → probe = partition-pruned scan);
    the probe join shuffles by cell id only.  Recall rises with n_probe
    (n_probe = n_centroids ≡ brute force); measured in tests/test_ann.
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _ivf_cells(vec_col, dim, n_centroids, 1, seed)[0].alias("cell"),
    )
    q = query_vecs.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(_ivf_cells(vec_col, dim, n_centroids, n_probe, seed)).alias("cell"),
    )
    scored = (
        e.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("vec"), F.col("qvec"))
                / (_norm(F.col("vec")) * _norm(F.col("qvec"))),
                decimals,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cos")
    )


def embedding_neardup_exact(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
    force: bool = False,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (all-pairs baseline).

    → (a_id, b_id, cos) with a_id < b_id and round(cos, decimals) ≥ threshold.
    O(N²) — the correctness baseline; at scale use
    :func:`embedding_neardup_pairs` (LSH-bucketed, same re-rank filter).
    GUARDED: above EXACT_PATH_MAX_ROWS input vectors this refuses without
    force=True.  The threshold is applied to the ROUNDED cosine in both
    this plan and the DuckDB oracle so float64 summation-order noise cannot
    straddle the cut.
    """
    from searchenginesimple_spark.operators.dedup import _guard_exact_path

    _guard_exact_path(
        embeddings, "embedding_neardup_exact", "embedding_neardup_pairs", force
    )
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("a.vec"), F.col("b.vec"))
                / (_norm(F.col("a.vec")) * _norm(F.col("b.vec"))),
                decimals,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            "cos",
        )
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.98,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold (LSH-bucketed).

    Banded self-join analogue of the simhash dedup, over dense vectors.
    """
    e = with_lsh_bucket(
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")),
        dim, n_planes, "vec",
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn(
            "cos",
            # round BEFORE the threshold (same rule as the exact baseline and
            # the DuckDB oracle) so float noise cannot straddle the cut
            F.round(
                _dot(F.col("a.vec"), F.col("b.vec"))
                / (_norm(F.col("a.vec")) * _norm(F.col("b.vec"))),
                6,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            "cos",
        )
    )
