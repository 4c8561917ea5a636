"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is sampled constantly — per-language mixture weighting,
ablation subsets, eval holdouts.  ``df.sample()`` is partition-layout- and
seed-dependent: the kept set changes when the cluster size or file split
changes, which breaks reproducibility and resume.  These operators key the
decision on a CONTENT-DERIVED hash instead, so the same row is kept or
dropped at any parallelism, on any re-run, on any engine (the DuckDB oracle
reproduces the sample bit-for-bit).

Physical shape: a pure map-side filter — no shuffle, no state, no driver
randomness.  At 10^12 files this is the only sampling shape that costs
nothing beyond the scan it is fused into.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from searchenginesimple_spark.functions.text import polyhash62_expr

_DENOM = 1_000_000


def sample_hash(key: Column) -> Column:
    """Uniform-ish bucket in [0, 10^6) from a row key (polyhash62 — the
    SQL-mirrorable family; see functions/text.py)."""
    return F.pmod(polyhash62_expr(key), F.lit(_DENOM))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    key: Column | str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum g with probability ``rates[g]`` —
    deterministically: row kept ⇔ hash(key) mod 10^6 < rate·10^6.

    ``key`` should identify the row stably across runs (an id or a content
    hash).  Strata not in ``rates`` fall back to ``default_rate``.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    bucket = sample_hash(key_col.cast("string"))
    threshold = reduce(
        lambda acc, kv: acc.when(F.col(group_col) == kv[0], int(kv[1] * _DENOM)),
        rates.items(),
        F.when(F.lit(False), 0),
    ).otherwise(int(default_rate * _DENOM))
    return df.filter(bucket < threshold)


def per_key_cap(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per group (per-domain / per-repo quota — the
    crawl-pipeline guard against one host dominating the corpus).

    Deterministic: rows rank by ``order_col`` ascending within each group, so
    the kept set is independent of partitioning.  The ``rank ≤ cap`` filter
    triggers Spark's WindowGroupLimit optimization with a PARTIAL (map-side)
    pass: each input partition forwards at most ``cap`` rows per group into
    the shuffle, so a hot host/repo with 10^9 rows ships ``cap`` rows per map
    task, not 10^9 — the skew the quota exists to cut never reaches the wire
    (plan pinned in tests/test_plans.py).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.asc(order_col))
    return (
        df.withColumn("grp_rank", F.row_number().over(w))
        .filter(F.col("grp_rank") <= cap)
        .drop("grp_rank")
    )
