"""BM25 index statistics + dense top-k scoring, pure DataFrame ops.

Re-expresses the reference's query pipeline (``include/Page/WebPageQuery.hpp``):

* posting fetch per query term  (WebPageQuery.hpp:47-50)   → broadcast hash join
* empty-posting term prune      (WebPageQuery.hpp:52-58)   → inner join drops OOV
* conjunctive doc intersection  (WebPageQuery.hpp:62-84)   → matched-term count == n_terms
* per-candidate score accum     (WebPageQuery.hpp:87-99)   → groupBy(query,doc).sum
* top-10 bounded heap           (WebPageQuery.hpp:102-121) → row_number window ≤ k
  (Catalyst turns single-query ORDER BY+LIMIT into TakeOrderedAndProject)

with the scorer swapped from the reference's TF-IDF cosine (Page.hpp:313-333)
to BM25 per the north rule:  idf = ln((N−df+0.5)/(df+0.5)+1),
tf_norm = tf·(k1+1)/(tf + k1·(1−b+b·dlen/avgdl)), score = Σ_t qtf·idf·tf_norm.
Duplicate query tokens weight by query-term frequency, mirroring the
reference's raw-token-multiset accumulation (WebPageQuery.hpp:87-99).

Determinism: scores are rounded to ``cfg.score_decimals`` BEFORE ranking, and
ties break on ascending doc_id — canonicalizing the reference's
insertion-order-dependent heap (SURVEY.md §2.5).

This is the *dense* scorer — every (query-term × posting) row flows through a
join.  The compressed/pruned path (block-max WAND over varbyte postings) lives
in operators/wand.py; both must be rank-identical.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT, TOKEN_RE, EngineConfig
from searchenginesimple_spark.functions.tokenize import (
    make_tokenize_udf,
    tokenize_expr,
    tokenize_udf,
)


@dataclass
class IndexStats:
    """Logical index tables (uncompressed).  All lazy DataFrames.

    tf         : (doc_id, term, tf)           — forward index, Page.hpp:419
    doc_stats  : (doc_id, dlen)               — BM25 length norm input
    term_stats : (term, df, idf)              — Page.hpp:313-321 analogue
    corpus     : 1 row (n_docs, avgdl)        — global scalars, kept as a
                 broadcastable 1-row frame so the whole plan stays lazy
    """

    tf: DataFrame
    doc_stats: DataFrame
    term_stats: DataFrame
    corpus: DataFrame


def tokens_of(
    docs: DataFrame,
    text_col: str = "content",
    use_pandas_udf: bool = False,
    token_re: str = TOKEN_RE,
) -> DataFrame:
    """docs(doc_id, <text_col>) → (doc_id, term) exploded token stream."""
    if use_pandas_udf:
        udf = tokenize_udf if token_re == TOKEN_RE else make_tokenize_udf(token_re)
        tok = udf(F.col(text_col))
    else:
        tok = tokenize_expr(text_col, token_re)
    return docs.select("doc_id", F.explode(tok).alias("term"))


def tf_mapside(
    docs: DataFrame,
    text_col: str = "content",
    use_pandas_udf: bool = False,
    token_re: str = TOKEN_RE,
    stopwords: tuple[str, ...] = (),
) -> DataFrame:
    """docs(doc_id, <text_col>) → (doc_id, term, tf) with NO shuffle.

    ``tokens_of(...).groupBy(doc_id, term)`` shuffles the ENTIRE token
    stream on (doc_id, term) — at 100 TB that is the build's largest
    shuffle, moving data that never needed to move: every document's tokens
    already sit together in its input row.  This computes the per-doc term
    counts inside ONE projection (sort the token array, run-length encode
    it with JVM array lambdas, explode the (term, tf) runs) — map-only,
    whole-stage-codegen'd, zero Python, bit-identical output (pinned in
    tests/test_tokenize.py::test_tf_mapside_equals_groupby).

    The downstream aggregations that DO need cross-doc grouping (df per
    term, posting runs per (term, shard)) shuffle these pre-aggregated
    (doc, term, tf) rows instead of raw tokens — strictly less data.
    """
    if use_pandas_udf:
        # a Python UDF cannot appear INSIDE a lambda higher-order function
        # (Spark UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF), so the
        # Arrow tokenizer materializes into its own projection (ArrowEvalPython
        # node) and the HOFs below operate on the plain array column
        udf = tokenize_udf if token_re == TOKEN_RE else make_tokenize_udf(token_re)
        docs = docs.select("doc_id", udf(F.col(text_col)).alias("__toks"))
        tok = F.col("__toks")
    else:
        tok = tokenize_expr(text_col, token_re)
    if stopwords:
        stop = F.array(*[F.lit(s) for s in stopwords])
        tok = F.filter(tok, lambda t: ~F.array_contains(stop, t))
    # STAGED projections, deliberately: `element_at(<expr>, p)` inside a
    # lambda re-evaluates <expr> PER ELEMENT (no common-subexpression
    # elimination across lambda boundaries) — with the sort inlined that is
    # O(n²·log n) per document (measured: a 5k-doc warmup build went from
    # ~20 s to minutes).  Binding the sorted array and the run-start
    # positions to attributes first makes every element_at an O(1) array
    # access; CollapseProject leaves multi-referenced non-cheap expressions
    # staged, so the optimizer cannot re-inline them.
    staged = docs.select("doc_id", F.array_sort(tok).alias("__srt"))
    srt = F.col("__srt")
    n = F.size(srt)
    # 1-based run starts: position p is a run start iff p == 1 or the token
    # differs from its predecessor.  F.when keeps the p-1 lookup unevaluated
    # at p == 1 (element_at index 0 is an error under ANSI); the n > 0 guard
    # keeps empty docs from evaluating sequence(1, 0) (NULL → explode drops
    # the doc, same as the groupBy path).
    starts_expr = F.filter(
        F.sequence(F.lit(1), n),
        lambda p: F.when(p == 1, F.lit(True)).otherwise(
            F.element_at(srt, p) != F.element_at(srt, p - 1)
        ),
    )
    staged = staged.select(
        "doc_id", "__srt", F.when(n > 0, starts_expr).alias("__starts")
    )
    starts = F.col("__starts")
    nrun = F.size(starts)
    # run length = next start − this start (sentinel n+1 closes the last run)
    nexts = F.concat(F.slice(starts, 2, F.greatest(nrun - 1, F.lit(0))), F.array(n + 1))
    runs = F.zip_with(
        starts, nexts, lambda s, e: F.struct(F.element_at(srt, s).alias("term"), (e - s).alias("tf"))
    )
    return (
        staged.select("doc_id", F.explode(runs).alias("r"))
        .select("doc_id", F.col("r.term").alias("term"), F.col("r.tf").cast("int").alias("tf"))
    )


def filter_stopwords(
    tokens: DataFrame, stopwords: tuple[str, ...], term_col: str = "term"
) -> DataFrame:
    """Drop stopword tokens (reference ``Page.hpp:294,305``) — BUILD path only;
    the query path never calls this (``WebPageQuery.hpp:140-160`` asymmetry:
    a stopword in a query simply finds no postings).

    Stop lists are a few hundred words: an IN-set predicate compiles to a
    JVM-side hash-set probe inside whole-stage codegen — no join, no shuffle,
    no broadcast needed.  No-op for the (default) empty list.
    """
    if not stopwords:
        return tokens
    return tokens.filter(~F.col(term_col).isin(list(stopwords)))


def build_index_stats(
    docs: DataFrame,
    text_col: str = "content",
    cfg: EngineConfig = DEFAULT,
    use_pandas_udf: bool = False,
) -> IndexStats:
    """docs(doc_id, <text_col>) → BM25 statistics tables.

    ``use_pandas_udf`` defaults to False (r6): the all-JVM tokenizer is
    bit-identical (tests/test_tokenize.py) and measured 20-25 % faster
    end-to-end — the token stream never crosses the JVM↔Python Arrow hop
    (guide §4.1).  The Arrow path stays selectable.

    tf is computed map-side (``tf_mapside`` — run-length counting in the
    scan projection, NO shuffle of the raw token stream); the only shuffles
    left are the pre-aggregated per-doc/per-term rollups, which move
    strictly less data.  At 100 TB these are exactly the keys the salted
    posting build in operators/postings.py re-uses; AQE sizes them.

    ``cfg.stopwords`` (if set) is applied to the token stream HERE, on the
    build side only — queries containing stopwords then find no postings,
    exactly the reference's build/query asymmetry.
    """
    tf = tf_mapside(docs, text_col, use_pandas_udf, cfg.token_re, cfg.stopwords)
    doc_stats = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dlen"))
    corpus = doc_stats.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dlen").alias("avgdl"),
    )
    term_stats = (
        tf.groupBy("term")
        .agg(F.count("*").cast("int").alias("df"))
        .crossJoin(F.broadcast(corpus.select("n_docs")))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
        )
        .drop("n_docs")
    )
    return IndexStats(tf=tf, doc_stats=doc_stats, term_stats=term_stats, corpus=corpus)


def query_terms(
    queries: DataFrame,
    query_col: str = "query",
    use_pandas_udf: bool = False,
    token_re: str = TOKEN_RE,
) -> DataFrame:
    """queries(query_id, query) → (query_id, query, term, qtf).

    Query-side TF mirrors WebPageQuery.hpp:140-185 minus its two cancelling
    sign quirks (constant IDF=−1 × min-heap-on-negatives, SURVEY.md §3.2).
    NB: no stopword filter on the query path — reference asymmetry preserved;
    ``token_re`` MUST be the index's spec or postings never match.
    """
    if use_pandas_udf:
        udf = tokenize_udf if token_re == TOKEN_RE else make_tokenize_udf(token_re)
        tok = udf(F.col(query_col))
    else:
        tok = tokenize_expr(query_col, token_re)
    return (
        queries.select("query_id", query_col, F.explode(tok).alias("term"))
        .groupBy("query_id", query_col, "term")
        .agg(F.count("*").cast("int").alias("qtf"))
    )


def bm25_topk(
    index: IndexStats,
    queries: DataFrame,
    cfg: EngineConfig = DEFAULT,
    query_col: str = "query",
    use_pandas_udf: bool = False,
    mode: str = "and",
    candidates: DataFrame | None = None,
    exclude_self: bool = False,
    keep_query_id: bool = False,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """Score a batch of queries; return (query, rank, docID, score),
    plus the leading ``query_id`` column when ``keep_query_id`` — the
    collision-safe key for callers that synthesize query strings (two seeds
    with identical keyword sets produce identical strings; joining back on
    the string would cross-join their result sets).

    mode="and" (default): conjunctive candidates, the reference semantics.
    mode="or": disjunctive — any doc matching ≥1 indexed term scores; the
    dense baseline the block-max pruned path (operators/wand.py) must equal.
    candidates (query_id, doc_id), if given, restricts scoring output to
    those pairs (left-semi join BEFORE ranking, so top-k is over the
    restricted set) — the hook phrase_topk uses.
    exclude_self drops rows where doc_id == query_id BEFORE ranking (for
    doc-as-query flows like more_like_this, where query_id IS a doc_id).
    tombstones (doc_id), if given, drops deleted docs BEFORE ranking
    (plans/delete.py live-docs filtering; compressed twin:
    operators/wand.py kernels).

    Physical shape: the query side is tiny → broadcast it against the tf
    table (one broadcast-hash join, no shuffle of tf by term); the per-doc
    length join rides the existing doc_id distribution; ranking is a window
    per query_id.  Conjunctive semantics: candidate docs must match ALL
    indexed query terms (WebPageQuery.hpp:62-84); fully-OOV queries yield
    zero rows (reference short-circuit WebPageQuery.hpp:64-68).
    """
    qt = query_terms(queries, query_col, use_pandas_udf, cfg.token_re)
    # OOV prune: inner join against term_stats (WebPageQuery.hpp:52-58).
    qt_idx = qt.join(index.term_stats, "term", "inner")
    n_terms = qt_idx.groupBy("query_id").agg(F.count("*").cast("int").alias("n_terms"))

    k1, b = F.lit(cfg.k1), F.lit(cfg.b)
    contrib = (
        index.tf.join(F.broadcast(qt_idx), "term", "inner")
        .join(index.doc_stats, "doc_id", "inner")
        .crossJoin(F.broadcast(index.corpus.select("avgdl")))
        .withColumn(
            "contribution",
            F.col("qtf")
            * F.col("idf")
            * (F.col("tf") * (k1 + F.lit(1.0)))
            / (F.col("tf") + k1 * (F.lit(1.0) - b + b * F.col("dlen") / F.col("avgdl"))),
        )
    )
    scored = (
        contrib.groupBy("query_id", query_col, "doc_id")
        .agg(
            F.round(F.sum("contribution"), cfg.score_decimals).alias("score"),
            F.count("*").cast("int").alias("nmatch"),
        )
        .join(F.broadcast(n_terms), "query_id")
    )
    if mode == "and":
        scored = scored.filter(F.col("nmatch") == F.col("n_terms"))
    if candidates is not None:
        scored = scored.join(
            candidates.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_semi"
        )
    if exclude_self:
        scored = scored.filter(F.col("doc_id") != F.col("query_id"))
    if tombstones is not None:
        # deleted docs (plans/delete.py) drop BEFORE ranking, so top-k
        # backfills with live docs.  Broadcast only under the guard — an
        # over-cap set (mass takedown awaiting compaction) shuffle-joins
        from searchenginesimple_spark.operators.wand import _tombstones_small

        tomb = tombstones.select("doc_id")
        if _tombstones_small(tomb, cfg):
            tomb = F.broadcast(tomb)
        scored = scored.join(tomb, "doc_id", "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    cols = [
        F.col(query_col).alias("query"),
        F.col("rank").cast("int").alias("rank"),
        F.col("doc_id").cast("long").alias("docID"),
        F.col("score").cast("double").alias("score"),
    ]
    if keep_query_id:
        cols.insert(0, F.col("query_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cfg.top_k)
        .select(*cols)
    )


def cosine_topk_reference(
    index: IndexStats,
    queries: DataFrame,
    cfg: EngineConfig = DEFAULT,
    query_col: str = "query",
) -> DataFrame:
    """The reference's ORIGINAL scorer, verbatim semantics (fidelity mode).

    TF-IDF weights w₀ = log2(N/(df+1))·tf (Page.hpp:313-321), per-doc global
    L2 normalization (Page.hpp:323-333), conjunctive candidates, and the
    net ranking of SURVEY.md §3.2 (the two sign quirks cancelled):

        score(q,d) = Σ_t q̂(t)·ŵ(d,t) / √(Σ_{t∈q} ŵ(d,t)²)

    where q̂ is the L2-normalized query TF vector (WebPageQuery.hpp:140-185)
    and the denominator's doc norm is restricted to the query's matched terms
    (WebPageQuery.hpp:87-99).  k=10, doc_id tie-break.
    """
    n_docs_col = F.broadcast(index.corpus.select("n_docs"))
    w0 = (
        index.tf.join(index.term_stats.select("term", "df"), "term")
        .crossJoin(n_docs_col)
        .withColumn(
            "w0",
            F.log2(F.col("n_docs") / (F.col("df") + F.lit(1.0))) * F.col("tf"),
        )
    )
    dnorm = Window.partitionBy("doc_id")
    weights = w0.withColumn(
        "w", F.col("w0") / F.sqrt(F.sum(F.col("w0") * F.col("w0")).over(dnorm))
    ).select("doc_id", "term", "w")

    qt = query_terms(queries, query_col, token_re=cfg.token_re)
    qn = Window.partitionBy("query_id")
    qhat = qt.withColumn(
        "qw", F.col("qtf") / F.sqrt(F.sum(F.col("qtf") * F.col("qtf")).over(qn))
    )
    qt_idx = qhat.join(index.term_stats.select("term"), "term", "inner")
    n_terms = qt_idx.groupBy("query_id").agg(F.count("*").cast("int").alias("n_terms"))

    cand = (
        weights.join(F.broadcast(qt_idx), "term", "inner")
        .groupBy("query_id", query_col, "doc_id")
        .agg(
            F.sum(F.col("qw") * F.col("w")).alias("xy"),
            F.sum(F.col("w") * F.col("w")).alias("y2"),
            F.count("*").cast("int").alias("nmatch"),
        )
        .join(F.broadcast(n_terms), "query_id")
        .filter(F.col("nmatch") == F.col("n_terms"))
        .withColumn("score", F.round(F.col("xy") / F.sqrt(F.col("y2")), cfg.score_decimals))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cfg.top_k)
        .select(
            F.col(query_col).alias("query"),
            F.col("rank").cast("int").alias("rank"),
            F.col("doc_id").cast("long").alias("docID"),
            F.col("score").cast("double").alias("score"),
        )
    )


def doc_keywords(index: IndexStats, k: int = 5) -> DataFrame:
    """Top-k tf·idf keywords per document → (doc_id, rank, term, weight).

    The distributed form of the reference's keyword-extraction weighting
    (its simhash stage votes with tf·idf keyword weights, Simhasher.hpp via
    Page.hpp:129; SURVEY §2.7 keyword-extraction row) exposed as a
    standalone operator — per-doc keyword summaries are also a standard
    training-corpus feature (topic tagging, index pruning).

    weight = round(tf · idf, 6), ranked per doc with ties broken on term
    ascending (rounding BEFORE ranking keeps engine and oracle rank-stable).
    tf ⋈ term_stats shuffles on term; the window shuffles on doc_id — both
    keys the index build already uses, so at scale this rides existing
    layouts; no global sort.
    """
    w = (
        index.tf.join(index.term_stats.select("term", "idf"), "term")
        .withColumn("weight", F.round(F.col("tf") * F.col("idf"), 6))
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("weight"), F.asc("term"))
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("int").alias("rank"), "term", "weight")
    )


def more_like_this(
    index: IndexStats,
    seed_doc_ids: list[int],
    k_keywords: int = 5,
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Doc-similarity search ("more like this") → (seed, rank, docID, score).

    Each seed document's top-``k_keywords`` tf·idf terms (doc_keywords)
    become a disjunctive BM25 query; the seed itself is excluded before
    ranking.  The classic search-engine related-results feature, built
    entirely from the existing keyword + scorer operators — the query side
    stays tiny (seeds × k_keywords rows), so the scoring join is the same
    broadcast shape as any query batch.
    """
    kws = doc_keywords(index, k=k_keywords).filter(
        F.col("doc_id").isin([int(d) for d in seed_doc_ids])
    )
    queries = kws.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "term"))),
                lambda s: s.term,
            ),
        ).alias("query")
    ).select(F.col("doc_id").alias("query_id"), "query")
    # keep_query_id: the seed id rides the ranking itself — joining back on
    # the synthesized keyword STRING would cross-join seeds that share a
    # keyword set (e.g. duplicate documents), duplicating (seed, rank) rows
    out = bm25_topk(
        index, queries, cfg, mode="or", exclude_self=True, use_pandas_udf=False,
        keep_query_id=True,
    )
    return out.select(
        F.col("query_id").alias("seed"), "rank", "docID", "score"
    )
