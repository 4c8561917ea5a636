"""Training-data curation plan: the production COMPOSITION of the dedup /
quality / sampling operator families into one resumable pipeline with
per-stage lineage metrics.

The reference has no such pipeline (its dedup is the inline simhash
suppression of the index build, ``Page.hpp:121-161``); this is the shape a
100 TB training-data run actually takes — each stage an already-verified
operator, chained:

  exact     sha256 exact dedup (operators/dedup.py::exact-dedup rule):
            keep the smallest doc_id per identical content.  One shuffle
            on the hash key.
  neardup   MinHash-LSH candidate pairs (minhash_dup_pairs) →
            connected-components clustering (operators/graph.py) →
            keep each cluster's smallest doc_id.  The CC stage is what
            makes pair output USABLE: pairwise suppression alone is
            order-dependent and non-transitive; the cluster-min rule is
            deterministic and layout-invariant.
  quality   map-side threshold filter over the quality/repetition
            features (functions/text.py) — no shuffle.
  sample    deterministic per-language stratified sample (hash-gated
            map-side filter) and an optional per-source quota cap
            (map-side WindowGroupLimit) — operators/sample.py.

Scale discipline:

* Stages persist SURVIVOR-ID tables (doc_id only) — never content.  The
  full content is written exactly once at the end (`curate_kept`), joined
  back from the input.  At 100 TB, re-writing content per stage would
  quadruple the pipeline's IO for no information.
* Each stage is `_SUCCESS`-gated (TableIO.exists(committed=True)) — a
  crashed run re-executes only uncommitted stages, the build-plan
  checkpoint discipline (plans/build.py).
* Metrics (`curate_metrics`: stage, docs_in, docs_out) are recomputed
  from the committed id tables (cheap doc_id-only counts) and written
  driver-side with no Spark job (TableIO.overwrite_rows), so resumes are
  idempotent and the table always reflects the committed state.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchenginesimple_spark.sources.io import TableIO


@dataclass(frozen=True)
class CurateConfig:
    # neardup stage (MinHash-LSH banding).  minhash_family: "xxhash"
    # (production default) or "poly" (the affine family every value of
    # which a SQL oracle can reproduce — operators/dedup.py)
    minhash_threshold: float = 0.7
    minhash_hashes: int = 64
    minhash_bands: int = 16
    shingle_n: int = 5
    minhash_family: str = "xxhash"
    # quality stage
    min_tokens: int = 5
    min_alpha_ratio: float = 0.2
    max_top_token_frac: float = 0.5
    # sample stage (None → stage is a pass-through and writes no table)
    sample_rates: dict[str, float] | None = None
    default_sample_rate: float = 0.0
    per_source_cap: int | None = None
    lang_col: str = "lang"
    source_col: str = "source"
    # chunk stage (None → no curate_chunks table): context-window packing
    # of the kept docs into training chunks (operators/chunk.py)
    chunk_tokens: int | None = None
    chunk_overlap_lines: int = 0
    # repo-pack stage (None → no curate_repo_samples table): repo-level
    # context packing of the kept docs (operators/repopack.py) — the
    # alternative terminal stage when training wants whole-repo samples
    repo_pack_tokens: int | None = None
    # despan stage (None → stage off): span-level dedup between the doc-
    # level dedup stages and quality — duplicated PASSAGES (winnow clone
    # spans ≥ this many tokens) are cut from the larger doc_id
    # (operators/spandedup.py), so quality scores and the kept table see
    # the CLEANED text.  Only rewritten docs are stored (curate_despan
    # table); everything downstream coalesces content against it.
    despan_min_tokens: int | None = None
    despan_k: int = 5
    despan_w: int = 4
    despan_min_shared: int = 2
    # winnow hash family for the despan fingerprints — "xx" (xxhash64,
    # production default) or "poly" (polyhash62: slower but reproducible
    # in plain SQL, the oracle-verification family; the minhash_family
    # precedent)
    despan_hash_family: str = "xx"
    # prefilter stage (all defaults off → stage is a pass-through and
    # writes no table): the "not first-party human code" exclusions of
    # functions/code.py — license allow-list, vendored paths, generated
    # markers, minified lines.  All map-side, run BEFORE dedup so excluded
    # files never cost a shingle.
    allowed_licenses: tuple[str, ...] | None = None
    drop_vendored: bool = False
    drop_generated: bool = False
    drop_minified: bool = False
    path_col: str = "path"


_STAGES = ("prefilter", "exact", "neardup", "quality", "sample")


def _ids(name: str) -> str:
    return f"curate_{name}_ids"


def curate(
    spark: SparkSession,
    docs: DataFrame,
    io: TableIO,
    cfg: CurateConfig = CurateConfig(),
    text_col: str = "content",
) -> DataFrame:
    """Run (or resume) the curation pipeline over ``docs(doc_id, <text_col>,
    lang, source, …)``; returns the kept documents (also committed to the
    ``curate_kept`` table).  Every rule is deterministic — same input ⇒ same
    kept set at any parallelism.

    Resume trusts committed stage tables — and ENFORCES the one-root-per-
    config contract: the first run commits a config fingerprint
    (``curate_config`` table) and every resume checks it, so re-running
    with a changed config against the same ``io`` root raises instead of
    silently keeping the old committed stages (e.g. enabling
    despan_min_tokens after curate_kept committed would otherwise append a
    'despan' metrics row while the kept table keeps the dirty text).
    Changed INPUT is still the caller's responsibility — use a fresh root
    per input, the same contract as plans/build.py's checkpoints."""
    import hashlib
    from dataclasses import asdict as _asdict

    fp = hashlib.sha256(
        json.dumps(
            {"cfg": _asdict(cfg), "text_col": text_col},
            sort_keys=True,
            default=str,
        ).encode()
    ).hexdigest()
    if io.exists("curate_config"):
        committed_fp = io.read("curate_config").collect()[0]["fingerprint"]
        if committed_fp != fp:
            raise ValueError(
                "curate config changed against a root with committed stage "
                f"tables (fingerprint {committed_fp[:12]} != {fp[:12]}): "
                "resume would silently keep stages computed under the old "
                "config — use a fresh io root for the new config"
            )
    else:
        io.overwrite_rows([(fp,)], "fingerprint string", "curate_config")
    from searchenginesimple_spark.functions.text import (
        quality_features,
        repetition_features,
    )
    from searchenginesimple_spark.operators.dedup import minhash_dup_pairs
    from searchenginesimple_spark.operators.graph import connected_components
    from searchenginesimple_spark.operators.sample import (
        per_key_cap,
        stratified_sample,
    )

    # ---- stage 0 (optional): license / vendored / generated prefilter -----
    d0 = docs
    prefilter_on = (
        cfg.allowed_licenses is not None
        or cfg.drop_vendored
        or cfg.drop_generated
        or cfg.drop_minified
    )
    if prefilter_on:
        if not io.exists(_ids("prefilter"), committed=True):
            from searchenginesimple_spark.functions.code import (
                detect_license,
                flag_autogenerated,
            )

            if cfg.drop_vendored and cfg.path_col not in docs.columns:
                raise ValueError(
                    f"drop_vendored needs column {cfg.path_col!r} in docs"
                )
            d = docs
            keep = F.lit(True)
            if cfg.allowed_licenses is not None:
                d = detect_license(d, content_col=text_col)
                keep = keep & F.col("license").isin(list(cfg.allowed_licenses))
            if cfg.drop_vendored or cfg.drop_generated or cfg.drop_minified:
                d = flag_autogenerated(
                    d,
                    content_col=text_col,
                    path_col=cfg.path_col if cfg.path_col in docs.columns else None,
                )
                if cfg.drop_vendored:
                    keep = keep & ~F.col("is_vendored")
                if cfg.drop_generated:
                    keep = keep & ~F.col("is_generated")
                if cfg.drop_minified:
                    keep = keep & ~F.col("is_minified")
            io.overwrite(d.filter(keep).select("doc_id"), _ids("prefilter"))
        d0 = docs.join(io.read(_ids("prefilter")), "doc_id", "left_semi")

    # ---- stage 1: exact dedup (content-hash min-id survivors) -------------
    if not io.exists(_ids("exact"), committed=True):
        survivors = (
            d0.select("doc_id", F.sha2(F.col(text_col), 256).alias("sha256"))
            .groupBy("sha256")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        io.overwrite(survivors, _ids("exact"))
    exact_ids = io.read(_ids("exact"))

    # ---- stage 2: near-dup dedup (LSH pairs → CC clusters → cluster min) --
    if not io.exists(_ids("neardup"), committed=True):
        d = docs.join(exact_ids, "doc_id", "left_semi")
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
        # clustered non-minimum members are the drops; everything else stays
        drops = cc.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        io.overwrite(exact_ids.join(drops, "doc_id", "left_anti"), _ids("neardup"))
    neardup_ids = io.read(_ids("neardup"))

    # ---- stage 2b (optional): span-level dedup (cut duplicated passages) --
    # runs AFTER doc-level dedup (whole near-dups are already gone; what is
    # left is partial overlap) and BEFORE quality, so downstream stages see
    # the cleaned text.  Only rewritten docs are stored.
    def _with_clean_content(d: DataFrame) -> DataFrame:
        if cfg.despan_min_tokens is None:
            return d
        clean = io.read("curate_despan").withColumnRenamed(text_col, "_clean")
        return (
            d.join(clean, "doc_id", "left")
            .withColumn(text_col, F.coalesce(F.col("_clean"), F.col(text_col)))
            .drop("_clean")
        )

    if cfg.despan_min_tokens is not None:
        if not io.exists("curate_despan", committed=True):
            from searchenginesimple_spark.operators.spandedup import (
                remove_clone_spans,
            )
            from searchenginesimple_spark.operators.winnow import (
                clone_pairs,
                clone_spans,
                winnow_fingerprints,
            )

            d = docs.join(neardup_ids, "doc_id", "left_semi")
            fps = winnow_fingerprints(
                d,
                k=cfg.despan_k,
                w=cfg.despan_w,
                content_col=text_col,
                hash_family=cfg.despan_hash_family,
            )
            spans = clone_spans(
                fps,
                clone_pairs(fps, min_shared=cfg.despan_min_shared),
                k=cfg.despan_k,
            )
            cleaned = remove_clone_spans(
                d.select("doc_id", text_col), spans, content_col=text_col,
                min_span_tokens=cfg.despan_min_tokens,
            )
            io.overwrite(
                cleaned.filter(F.col("n_spans_applied") > 0).select(
                    "doc_id", text_col
                ),
                "curate_despan",
            )

    # ---- stage 3: quality filter (map-side, no shuffle) --------------------
    # (measured r6: pre-staging the token array into its own projection is
    # NOT a win — Spark 4's runtime subexpression elimination already
    # dedupes the repeated tokenize across the feature columns, and the
    # extra projection materializes the array per row for nothing)
    if not io.exists(_ids("quality"), committed=True):
        c = F.col(text_col)
        q = dict(quality_features(c))
        r = repetition_features(c)
        keep = (
            (q["n_tokens"] >= cfg.min_tokens)
            & (q["alpha_ratio"] >= cfg.min_alpha_ratio)
            & (r["top_token_frac"] <= cfg.max_top_token_frac)
        )
        kept = (
            _with_clean_content(docs.join(neardup_ids, "doc_id", "left_semi"))
            .filter(keep)
            .select("doc_id")
        )
        io.overwrite(kept, _ids("quality"))
    quality_ids = io.read(_ids("quality"))

    # ---- stage 4: sampling / quota (map-side filters) ----------------------
    final_ids = quality_ids
    if cfg.sample_rates is not None or cfg.per_source_cap is not None:
        if not io.exists(_ids("sample"), committed=True):
            d = docs.join(quality_ids, "doc_id", "left_semi")
            if cfg.sample_rates is not None:
                d = stratified_sample(
                    d,
                    cfg.sample_rates,
                    group_col=cfg.lang_col,
                    default_rate=cfg.default_sample_rate,
                )
            if cfg.per_source_cap is not None:
                d = per_key_cap(d, cfg.per_source_cap, group_col=cfg.source_col)
            io.overwrite(d.select("doc_id"), _ids("sample"))
        final_ids = io.read(_ids("sample"))

    # ---- materialize kept docs ONCE + recompute metrics --------------------
    # (with despan on, the kept table carries the CLEANED content)
    if not io.exists("curate_kept", committed=True):
        io.overwrite(
            _with_clean_content(docs.join(final_ids, "doc_id", "left_semi")),
            "curate_kept",
        )

    # ---- optional stage 5: context-window packing (operators/chunk.py) ----
    # reads the COMMITTED kept table (compact parquet, content read once) —
    # the chunk projection is map-side, so this stage adds zero shuffles
    if cfg.chunk_tokens is not None and not io.exists(
        "curate_chunks", committed=True
    ):
        from searchenginesimple_spark.operators.chunk import chunk_documents

        io.overwrite(
            chunk_documents(
                io.read("curate_kept"),
                chunk_tokens=cfg.chunk_tokens,
                overlap_lines=cfg.chunk_overlap_lines,
                content_col=text_col,
            ),
            "curate_chunks",
        )

    # ---- optional stage 5b: repo-level packing (operators/repopack.py) ----
    # same contract as the chunk stage: reads the committed kept table
    if cfg.repo_pack_tokens is not None and not io.exists(
        "curate_repo_samples", committed=True
    ):
        from searchenginesimple_spark.operators.repopack import pack_repo_samples

        missing = {"repo", "path"} - set(docs.columns)
        if missing:
            raise ValueError(f"repo_pack_tokens needs columns {sorted(missing)} in docs")

        io.overwrite(
            pack_repo_samples(
                io.read("curate_kept"),
                sample_tokens=cfg.repo_pack_tokens,
                content_col=text_col,
            ),
            "curate_repo_samples",
        )

    n_in = docs.count()
    rows, prev = [], n_in
    for s in _STAGES:
        # skipped optional stages (prefilter/sample) are pass-throughs
        n = io.read(_ids(s)).count() if io.exists(_ids(s)) else prev
        rows.append((s, prev, n))
        prev = n
    if cfg.despan_min_tokens is not None:
        # a rewrite stage, not a filter: docs_in = the set it actually ran
        # over (the neardup survivors — it runs BEFORE quality/sample),
        # docs_out = how many docs were span-cleaned
        nd_out = next(n for s, _, n in rows if s == "neardup")
        rows.append(("despan", nd_out, io.read("curate_despan").count()))
    if cfg.chunk_tokens is not None:
        rows.append(("chunk", prev, io.read("curate_chunks").count()))
    if cfg.repo_pack_tokens is not None:
        rows.append(("repo_pack", prev, io.read("curate_repo_samples").count()))
    io.overwrite_rows(rows, "stage string, docs_in long, docs_out long", "curate_metrics")

    return io.read("curate_kept")
