"""Incremental curation: admit a DELTA of new documents into an existing
curation root without re-processing the base corpus.

Production training-data pipelines curate daily increments; re-running
plans/curate.py over base ∪ delta re-pays the whole base every day.  This
is the curation-level twin of the index's LSM merge (plans/merge.py):

  state      ``curate_sigs`` persists per-kept-doc (sha256, MinHash
             signature) — everything delta dedup needs from the base,
             recomputed NEVER (backfilled from ``curate_kept`` on first
             use, appended per generation after).  ``curate_kept_gen``
             is the kept corpus partitioned by generation (gen=0 =
             backfilled batch output); both tables grow by dynamic
             partition overwrite, so every generation's write is
             idempotent.
  exact      delta sha256 vs itself (min-id) and vs the base sha set
             (broadcast-joinable? no — a 10^12-doc base sha set is a
             normal shuffle join on sha256; Spark picks broadcast when
             small).  Base always wins.
  neardup    within-delta: the batch pipeline's own MinHash-LSH → CC →
             cluster-min.  Delta-vs-base: band-bucket join of delta
             signatures against the PERSISTED base signatures (the same
             banding construction — no base shingling, no base scan of
             content) → estimated-Jaccard filter → the DELTA doc drops
             (base ids < delta ids by contract, so this IS the min-id
             survivor rule).  Like merge.py, history is not re-litigated:
             a base doc is never dropped by an increment.
  quality    map-side, delta only (same thresholds).
  sample     the stratified sample is hash-gated per doc — increment-
             stable by construction.  The per-source quota is enforced
             GLOBALLY: each source's remaining budget = cap − kept-so-far
             (a cheap agg over the kept table's id/source columns), and
             the delta ranks into what remains.
  commit     per-stage id tables are ``_SUCCESS``-gated per generation;
             the generation marker row (``curate_generations``) appends
             LAST, so a crashed increment re-runs as itself and
             re-overwrites its own partitions (the merge.py recipe).

Contract: every delta doc_id must exceed every previously SEEN doc_id —
kept or dropped (the caller assigns ids monotonically, e.g. with_doc_ids
over an offset range — the same contract merge.py states); violating it
raises.  Each increment records its true input max in the generation
marker row (``max_id``), so the check covers ids that prior increments
saw and dropped; the one blind spot is ids the gen-0 BATCH run dropped
(it predates the marker table — only its kept max is recoverable).

Dedup scope — KEPT-ONLY, a deliberate divergence from batch: delta docs
dedup against the sha/MinHash state of ADMITTED docs.  A delta doc that
near-duplicates a base doc which quality/sampling REJECTED is admitted
here, where the batch pipeline over base ∪ delta would have deduped it
first (neardup runs before quality) and then rejected the whole cluster.
Persisting sigs for rejected docs would close the gap at the cost of
state growing with the REJECTED volume (typically ≫ kept at web scale);
kept-only is the production trade.  Increment ≡ batch therefore holds
exactly for the exact-dup case and for near-dups of kept docs — the
equivalences the tests pin.

The optional chunk/repo-pack/despan terminal stages are batch-only — run
them over the full kept table when needed.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from searchenginesimple_spark.plans.curate import CurateConfig
from searchenginesimple_spark.sources.io import TableIO


def read_curated(io: TableIO) -> DataFrame:
    """The full kept corpus: the generation-partitioned table when
    increments have run, else the batch table."""
    if io.exists("curate_kept_gen"):
        return io.read("curate_kept_gen").drop("gen")
    return io.read("curate_kept")


def _sigs(docs: DataFrame, cfg: CurateConfig, text_col: str) -> DataFrame:
    from searchenginesimple_spark.operators.dedup import minhash_signatures

    sha = docs.select(
        "doc_id", F.sha2(F.col(text_col), 256).alias("sha256")
    )
    sig = minhash_signatures(
        docs, cfg.minhash_hashes, cfg.shingle_n, text_col=text_col,
        hash_family=cfg.minhash_family,
    )
    return sha.join(sig, "doc_id", "left")  # empty docs have no shingles


def _banded(sigs: DataFrame, cfg: CurateConfig) -> DataFrame:
    # THE banding rule — the same helper minhash_dup_pairs uses, so the
    # within-delta and delta-vs-base candidate generators cannot diverge
    from searchenginesimple_spark.operators.dedup import minhash_banded

    return minhash_banded(
        sigs, cfg.minhash_hashes, cfg.minhash_bands, cfg.minhash_family
    )


def curate_increment(
    spark: SparkSession,
    new_docs: DataFrame,
    io: TableIO,
    cfg: CurateConfig = CurateConfig(),
    text_col: str = "content",
) -> DataFrame:
    """Admit ``new_docs`` into the curation root at ``io``; returns the
    ADMITTED delta rows (also committed as generation g's partition of
    ``curate_kept_gen``).  See module docstring for semantics."""
    from searchenginesimple_spark.functions.text import (
        quality_features,
        repetition_features,
    )
    from searchenginesimple_spark.operators.dedup import minhash_dup_pairs
    from searchenginesimple_spark.operators.graph import connected_components
    from searchenginesimple_spark.operators.sample import stratified_sample

    if not io.exists("curate_kept", committed=True) and not io.exists(
        "curate_kept_gen", committed=True
    ):
        raise ValueError("curate_increment needs a committed base curation run")

    # ---- generation number + idempotent backfill of the LSM state ---------
    markers = (
        io.read("curate_generations").collect()
        if io.exists("curate_generations")
        else []
    )
    gens = [int(r["gen"]) for r in markers]
    g = (max(gens) + 1) if gens else 1
    # true max INPUT id per prior increment (admitted or not) — recorded in
    # the marker rows so a delta id can never collide with a doc_id a prior
    # generation saw and dropped.  (Gen 0's batch run predates the marker
    # table, so its dropped ids are validated against only via the kept
    # table — the documented residual weakness of the backfilled base.)
    seen_max = max(
        (
            int(r["max_id"])
            for r in markers
            if "max_id" in r and r["max_id"] is not None
        ),
        default=None,
    )
    # backfill gate checks BOTH tables, and sigs write FIRST: a crash
    # between the two writes must re-trigger the backfill on retry, never
    # read a partial signature set (which would silently ADMIT delta docs
    # duplicating the base docs whose sigs are missing)
    if not (
        io.exists("curate_kept_gen", committed=True)
        and io.exists("curate_sigs", committed=True)
    ):
        base = io.read("curate_kept")
        io.overwrite_partitions(
            _sigs(base, cfg, text_col).withColumn("gen", F.lit(0)),
            "curate_sigs",
            "gen",
        )
        io.overwrite_partitions(
            base.withColumn("gen", F.lit(0)), "curate_kept_gen", "gen"
        )

    kept_prior = io.read("curate_kept_gen").filter(F.col("gen") < g)
    sigs_prior = io.read("curate_sigs").filter(F.col("gen") < g).drop("gen")

    # ---- id contract: every delta id beyond every id EVER SEEN -------------
    # (kept max ∪ recorded per-generation input maxes — a delta id colliding
    # with a doc a prior increment saw and DROPPED would corrupt any table
    # keyed on historical ids)
    kept_max = kept_prior.agg(F.max("doc_id")).collect()[0][0]
    base_max = max(
        (m for m in (kept_max, seen_max) if m is not None), default=None
    )
    mm = new_docs.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    ).collect()[0]
    delta_min, delta_max = mm["mn"], mm["mx"]
    if delta_min is None:
        raise ValueError("curate_increment: empty delta")
    if base_max is not None and delta_min <= base_max:
        raise ValueError(
            f"curate_increment: delta doc_ids must exceed every previously "
            f"seen id ({delta_min} <= {base_max}) — the min-id survivor "
            f"rule needs it"
        )

    def _t(name: str) -> str:
        return f"curate_g{g}_{name}_ids"

    # ---- stage 0 (optional): prefilter — same rules as the batch plan ------
    d0 = new_docs
    prefilter_on = (
        cfg.allowed_licenses is not None
        or cfg.drop_vendored
        or cfg.drop_generated
        or cfg.drop_minified
    )
    if prefilter_on:
        if not io.exists(_t("prefilter"), committed=True):
            from searchenginesimple_spark.functions.code import (
                detect_license,
                flag_autogenerated,
            )

            d = new_docs
            keep = F.lit(True)
            if cfg.allowed_licenses is not None:
                d = detect_license(d, content_col=text_col)
                keep = keep & F.col("license").isin(list(cfg.allowed_licenses))
            if cfg.drop_vendored or cfg.drop_generated or cfg.drop_minified:
                d = flag_autogenerated(
                    d,
                    content_col=text_col,
                    path_col=cfg.path_col if cfg.path_col in new_docs.columns else None,
                )
                if cfg.drop_vendored:
                    keep = keep & ~F.col("is_vendored")
                if cfg.drop_generated:
                    keep = keep & ~F.col("is_generated")
                if cfg.drop_minified:
                    keep = keep & ~F.col("is_minified")
            io.overwrite(d.filter(keep).select("doc_id"), _t("prefilter"))
        d0 = new_docs.join(io.read(_t("prefilter")), "doc_id", "left_semi")

    # ---- stage 1: exact — within delta AND vs the base sha set -------------
    if not io.exists(_t("exact"), committed=True):
        delta_sha = d0.select(
            "doc_id", F.sha2(F.col(text_col), 256).alias("sha256")
        )
        within = (
            delta_sha.groupBy("sha256")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id", "sha256")
        )
        vs_base = within.join(
            sigs_prior.select("sha256"), "sha256", "left_anti"
        )
        io.overwrite(vs_base.select("doc_id"), _t("exact"))
    exact_ids = io.read(_t("exact"))

    # ---- stage 2: neardup — within delta, then banded vs base signatures ---
    if not io.exists(_t("neardup"), committed=True):
        d = d0.join(exact_ids, "doc_id", "left_semi")
        pairs = minhash_dup_pairs(
            d,
            n_hashes=cfg.minhash_hashes,
            bands=cfg.minhash_bands,
            shingle_n=cfg.shingle_n,
            threshold=cfg.minhash_threshold,
            text_col=text_col,
            hash_family=cfg.minhash_family,
        )
        cc = connected_components(pairs, "a_id", "b_id")
        drops_within = cc.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        surv_within = exact_ids.join(drops_within, "doc_id", "left_anti")

        # vs base: band join of the delta survivors' signatures against the
        # persisted base signatures — base never drops, only the delta doc
        delta_sigs = _sigs(
            d.join(surv_within, "doc_id", "left_semi"), cfg, text_col
        )
        nb = _banded(sigs_prior.select("doc_id", "sig"), cfg).alias("base")
        nd = _banded(delta_sigs.select("doc_id", "sig"), cfg).alias("delta")
        cand = (
            nd.join(
                nb,
                (F.col("delta.band_id") == F.col("base.band_id"))
                & (F.col("delta.band_key") == F.col("base.band_key")),
            )
            .select(
                F.col("delta.doc_id").alias("doc_id"),
                F.col("delta.sig").alias("siga"),
                F.col("base.sig").alias("sigb"),
            )
            .distinct()
        )
        from searchenginesimple_spark.operators.dedup import minhash_est_jaccard

        est = minhash_est_jaccard("siga", "sigb", cfg.minhash_hashes)
        drops_base = (
            cand.withColumn("est", F.round(est, 6))
            .filter(F.col("est") >= cfg.minhash_threshold)
            .select("doc_id")
            .distinct()
        )
        io.overwrite(
            surv_within.join(drops_base, "doc_id", "left_anti"), _t("neardup")
        )
    neardup_ids = io.read(_t("neardup"))

    # ---- stage 3: quality (map-side, same thresholds as batch) -------------
    if not io.exists(_t("quality"), committed=True):
        c = F.col(text_col)
        q = dict(quality_features(c))
        r = repetition_features(c)
        keep = (
            (q["n_tokens"] >= cfg.min_tokens)
            & (q["alpha_ratio"] >= cfg.min_alpha_ratio)
            & (r["top_token_frac"] <= cfg.max_top_token_frac)
        )
        io.overwrite(
            new_docs.join(neardup_ids, "doc_id", "left_semi")
            .filter(keep)
            .select("doc_id"),
            _t("quality"),
        )
    quality_ids = io.read(_t("quality"))

    # ---- stage 4: sampling (increment-stable) + GLOBAL per-source quota ----
    final_ids = quality_ids
    if cfg.sample_rates is not None or cfg.per_source_cap is not None:
        if not io.exists(_t("sample"), committed=True):
            d = new_docs.join(quality_ids, "doc_id", "left_semi")
            if cfg.sample_rates is not None:
                d = stratified_sample(
                    d,
                    cfg.sample_rates,
                    group_col=cfg.lang_col,
                    default_rate=cfg.default_sample_rate,
                )
            if cfg.per_source_cap is not None:
                # remaining budget per source = cap − kept so far; the
                # delta ranks by doc_id into what remains
                used = kept_prior.groupBy(cfg.source_col).agg(
                    F.count("*").alias("_used")
                )
                w = Window.partitionBy(cfg.source_col).orderBy(F.asc("doc_id"))
                d = (
                    d.withColumn("_rk", F.row_number().over(w))
                    .join(F.broadcast(used), cfg.source_col, "left")
                    .filter(
                        F.col("_rk")
                        <= F.lit(cfg.per_source_cap)
                        - F.coalesce(F.col("_used"), F.lit(0))
                    )
                    .drop("_rk", "_used")
                )
            io.overwrite(d.select("doc_id"), _t("sample"))
        final_ids = io.read(_t("sample"))

    # ---- commit generation g: kept partition, sigs partition, marker ------
    admitted = new_docs.join(final_ids, "doc_id", "left_semi")
    # kept-table schema contract: every generation's partition must carry
    # the SAME columns — plain parquet readers sample one file's footer
    # (no mergeSchema), so a generation whose delta lacked e.g. 'path'
    # would make read_curated() file-sampling-order dependent.  Align the
    # admitted delta to the existing kept schema: missing columns are
    # null-filled at the kept type; a delta-only EXTRA column is rejected
    # loudly (committing it would silently fork the table schema; evolve
    # the base table first, or drop the column caller-side).
    kept_fields = [
        f for f in io.read("curate_kept_gen").schema.fields if f.name != "gen"
    ]
    kept_names = {f.name for f in kept_fields}
    extra = [c for c in admitted.columns if c not in kept_names]
    if extra:
        raise ValueError(
            f"curate_increment: delta columns {extra} do not exist in "
            f"curate_kept_gen ({sorted(kept_names)}) — partitioned parquet "
            f"cannot carry per-generation schemas"
        )
    # present columns are CAST to the kept type too — a name-only
    # reconciliation would commit e.g. an int doc_id into a long column and
    # fork the physical schema just as badly as a missing column
    admitted = admitted.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in admitted.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in kept_fields
        ]
    )
    io.overwrite_partitions(
        admitted.withColumn("gen", F.lit(g)), "curate_kept_gen", "gen"
    )
    io.overwrite_partitions(
        _sigs(admitted, cfg, text_col).withColumn("gen", F.lit(g)),
        "curate_sigs",
        "gen",
    )
    n_in = new_docs.count()
    n_out = final_ids.count()
    io.append_rows(
        [(g, n_in, n_out, int(delta_max), time.time())],
        "gen int, docs_in long, docs_out long, max_id long, ts double",
        "curate_generations",
    )
    return io.read("curate_kept_gen").filter(F.col("gen") == g).drop("gen")
