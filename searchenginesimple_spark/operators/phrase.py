"""Positional postings + exact-phrase queries.

The reference engine is bag-of-words only (its index maps term → {doc: w},
``include/Page/Page.hpp:313-333``; queries intersect doc SETS,
``include/Page/WebPageQuery.hpp:62-84``) — phrase search is the standard
fulltext-index capability it lacks, and the natural next stop for this tier.
Two paths, verified identical in tests/test_phrase.py:

* **Dense baseline** (`phrase_match_dense`) — pure JVM: tokenize both sides
  with the engine spec, space-join the token streams, and test token-sequence
  containment as substring containment (tokens contain no spaces, so the two
  are exactly equivalent).  This is also the shape of the DuckDB oracle.
* **Indexed scale path** (`phrase_match_indexed`) — positional postings:
  the posting build's (term, doc-range shard) shuffle extended with per-doc
  position lists (delta+varbyte, counts sidecar).  Query = broadcast the
  phrase's (term, offsets) rows onto the postings scan (term-IN pushdown),
  group by (phrase, shard), and inside an Arrow kernel intersect doc lists
  rarest-first then verify adjacency: a doc matches iff
  ``∩_{(t,o) ∈ phrase} (positions_t(doc) − o) ≠ ∅``.  Repeated terms in a
  phrase contribute one posting row with several offsets.  Like the BM25
  WAND kernel, every (phrase × shard) group is independent — no cross-shard
  state, which is what a 1000-executor cluster wants; per-group work is
  bounded by shard_span docs by construction.

Index size note (the at-scale tradeoff): positions roughly triple posting
bytes vs doc+tf only, which is why they live in a SEPARATE table built on
demand (`build_positional_postings`) rather than widening the BM25 postings
every build.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from searchenginesimple_spark.config import DEFAULT, EngineConfig
from searchenginesimple_spark.functions.codec import (
    delta_decode_rows,
    delta_encode_rows,
    varbyte_decode,
    varbyte_encode_rows,
)
from searchenginesimple_spark.functions.tokenize import tokenize_expr
from searchenginesimple_spark.operators.postings import shard_of

# --------------------------------------------------------------------------
# build side
# --------------------------------------------------------------------------

_PPOSTING_STRUCT = T.StructType(
    [
        T.StructField("df", T.IntegerType()),
        T.StructField("ids", T.BinaryType()),    # delta+varbyte sorted doc ids
        T.StructField("npos", T.BinaryType()),   # varbyte positions-per-doc
        T.StructField("pos", T.BinaryType()),    # per-doc delta+varbyte positions
    ]
)


@pandas_udf(_PPOSTING_STRUCT)
def _encode_positional(doc_arrs: pd.Series, pos_arrs: pd.Series) -> pd.DataFrame:
    """(sorted parallel doc/pos arrays per (term, shard) group) → packed row.

    numpy per group (np.unique for doc boundaries, batched delta/varbyte for
    the position runs) — the loop is over Arrow-batch rows, i.e. (term, shard)
    groups, never over postings.
    """
    out = {"df": [], "ids": [], "npos": [], "pos": []}
    for docs, poss in zip(doc_arrs, pos_arrs):
        d = np.asarray(docs, dtype=np.uint64)
        p = np.asarray(poss, dtype=np.uint64)
        # packed-key layout bound (see _POS_SHIFT/_POS_BIAS): a position at
        # or past 2²⁴ − 2·4096 would bleed into the next doc_id's keyspace
        # and SILENTLY corrupt phrase matches — fail loudly instead.  ~16.7M
        # tokens in ONE document; real corpora never get close.
        if p.size and int(p.max()) >= (1 << 24) - 2 * 4096:
            raise ValueError(
                f"document token position {int(p.max())} exceeds the packed "
                "positional-key bound (2^24 - 2*4096); split the document "
                "or use phrase_match_dense"
            )
        uniq, counts = np.unique(d, return_counts=True)
        ids_buf, _ = varbyte_encode_rows(
            delta_encode_rows(uniq, np.array([uniq.size])), np.array([uniq.size])
        )
        np_buf, _ = varbyte_encode_rows(counts.astype(np.uint64), np.array([counts.size]))
        pos_buf, _ = varbyte_encode_rows(delta_encode_rows(p, counts), np.array([p.size]))
        out["df"].append(int(uniq.size))
        out["ids"].append(ids_buf)
        out["npos"].append(np_buf)
        out["pos"].append(pos_buf)
    return pd.DataFrame(out)


def tokens_with_pos(
    docs: DataFrame,
    cfg: EngineConfig = DEFAULT,
    text_col: str = "content",
    tokens_col=None,
) -> DataFrame:
    """documents(doc_id, content) → (doc_id, pos, term); pos is the 0-based
    token offset (posexplode of the JVM tokenizer — no Python).

    ``tokens_col`` (optional Column of array<string>) swaps in an alternate
    tokenizer — e.g. the dictionary-FMM CJK segmenter
    (functions/segment.py) — while keeping the identical downstream plan."""
    tok = tokens_col if tokens_col is not None else tokenize_expr(text_col, cfg.token_re)
    return docs.select("doc_id", F.posexplode(tok).alias("pos", "term"))


def build_positional_postings(
    docs: DataFrame,
    cfg: EngineConfig = DEFAULT,
    text_col: str = "content",
    tokens_col=None,
) -> DataFrame:
    """→ positional postings (term, shard, df, ids, npos, pos).

    Same one-shuffle (term, doc-range-shard) construction as
    operators/postings.py — the range salt bounds every group at shard_span
    docs regardless of term hotness; sort_array hands the encoder
    (doc_id, pos)-sorted runs.
    """
    tp = tokens_with_pos(docs, cfg, text_col, tokens_col).withColumn(
        "shard", shard_of(F.col("doc_id"), cfg)
    )
    grouped = (
        tp.repartition(cfg.shuffle_partitions, "term", "shard")
        .groupBy("term", "shard")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "pos"))).alias("tp"))
        .select(
            "term",
            "shard",
            F.transform("tp", lambda x: x.doc_id).alias("doc_arr"),
            F.transform("tp", lambda x: x.pos.cast("long")).alias("pos_arr"),
        )
    )
    return grouped.select(
        "term", "shard", _encode_positional("doc_arr", "pos_arr").alias("p")
    ).select("term", "shard", "p.df", "p.ids", "p.npos", "p.pos")


# --------------------------------------------------------------------------
# query side
# --------------------------------------------------------------------------


def phrase_terms(
    phrases: DataFrame, cfg: EngineConfig = DEFAULT, tokens_col=None
) -> DataFrame:
    """phrases(phrase_id, phrase) → (phrase_id, term, offsets, n_terms).

    offsets = every 0-based token offset at which `term` occurs in the phrase
    (repeated terms → one row, several offsets); n_terms = distinct terms.
    ``tokens_col`` swaps in an alternate tokenizer (must match the one the
    positional postings were built with — e.g. dictionary-FMM)."""
    tok = phrases.select(
        "phrase_id",
        F.posexplode(
            tokens_col if tokens_col is not None else tokenize_expr("phrase", cfg.token_re)
        ).alias("off", "term"),
    )
    per_term = tok.groupBy("phrase_id", "term").agg(
        F.sort_array(F.collect_list("off")).alias("offsets")
    )
    n = per_term.groupBy("phrase_id").agg(F.count("*").cast("int").alias("n_terms"))
    return per_term.join(n, "phrase_id")


def phrase_match_dense(
    docs: DataFrame,
    phrases: DataFrame,
    cfg: EngineConfig = DEFAULT,
    text_col: str = "content",
) -> DataFrame:
    """Correctness baseline → (phrase_id, phrase, doc_id).

    Token-sequence containment == substring containment on the space-joined
    token streams (tokens never contain spaces).  Empty-token phrases match
    nothing (same convention as the indexed path: no terms → no postings).
    Wholly JVM whole-stage-codegen; the broadcast side is the phrase set.
    """
    ptok = phrases.select(
        "phrase_id",
        "phrase",
        F.concat(
            F.lit(" "), F.array_join(tokenize_expr("phrase", cfg.token_re), " "), F.lit(" ")
        ).alias("needle"),
    ).filter(F.length("needle") > 2)
    dtok = docs.select(
        "doc_id",
        F.concat(
            F.lit(" "), F.array_join(tokenize_expr(text_col, cfg.token_re), " "), F.lit(" ")
        ).alias("hay"),
    )
    return (
        dtok.crossJoin(F.broadcast(ptok))
        .filter(F.contains("hay", F.col("needle")))
        .select("phrase_id", "phrase", "doc_id")
    )


# packed (doc, shifted-pos) key layout for the vectorized adjacency intersect:
# key = doc_id·2²⁴ + (pos − offset + _POS_BIAS), all uint64 arithmetic.
# Bounds this encodes (both generous for real corpora, asserted nowhere hot):
# per-doc token position < 2²⁴ − 2·_POS_BIAS (≈16.7M tokens/doc) and
# doc_id < 2⁴⁰ (10¹² files fits).
_POS_SHIFT = np.uint64(24)
_POS_BIAS = np.uint64(4096)  # > max phrase length, keeps pos − offset ≥ 0


def _phrase_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (phrase_id, shard) group → matching (phrase_id, doc_id) rows.

    Fully vectorized: a doc matches iff ∩_{(term,o)} {(doc, p − o) : p ∈
    positions_term(doc)} is non-empty, so the kernel intersects SORTED packed
    key arrays across (term, offset) pairs — no per-candidate python loop;
    work is O(total postings of the phrase's terms in this shard), rarest
    term first so the running set only shrinks.
    """
    empty = pd.DataFrame({"phrase_id": pd.Series([], dtype="int64"),
                          "doc_id": pd.Series([], dtype="int64")})
    n_terms = int(pdf["n_terms"].iloc[0])
    max_off = max((max(o) for o in pdf["offsets"]), default=0)
    if max_off >= int(_POS_BIAS):
        # pos − offset + _POS_BIAS would underflow uint64 → silent garbage;
        # both query paths (distributed + serving engine) funnel through
        # this kernel, so one loud guard covers them.
        raise ValueError(
            f"phrase token offset {max_off} exceeds the packed-key bias "
            f"({int(_POS_BIAS)}); phrases this long are not supported by "
            "the indexed path — use phrase_match_dense"
        )
    if len(pdf) < n_terms:
        return empty  # some phrase term absent from this shard
    pid = int(pdf["phrase_id"].iloc[0])
    pdf = pdf.sort_values("df").reset_index(drop=True)  # rarest-first

    keys: np.ndarray | None = None
    for i in range(len(pdf)):
        ids = np.cumsum(varbyte_decode(pdf["ids"].iloc[i]), dtype=np.uint64)
        counts = varbyte_decode(pdf["npos"].iloc[i]).astype(np.int64)
        flat = delta_decode_rows(varbyte_decode(pdf["pos"].iloc[i]), counts)
        doc_rep = np.repeat(ids, counts)  # ascending; positions ascend per doc
        base = (doc_rep << _POS_SHIFT) + flat + _POS_BIAS  # sorted ascending
        for o in sorted(pdf["offsets"].iloc[i]):
            shifted = base - np.uint64(o)
            keys = shifted if keys is None else keys[
                np.isin(keys, shifted, assume_unique=True)
            ]
            if keys is None or keys.size == 0:
                return empty
    if keys is None or keys.size == 0:
        return empty
    matched = np.unique(keys >> _POS_SHIFT).astype(np.int64)
    return pd.DataFrame({"phrase_id": pid, "doc_id": matched})


def phrase_match_indexed(
    ppostings: DataFrame,
    phrases: DataFrame,
    cfg: EngineConfig = DEFAULT,
    pushdown_terms: bool = True,
    phrase_tokens_col=None,
) -> DataFrame:
    """Scale path → (phrase_id, phrase, doc_id); identical rows to the dense
    baseline (tests/test_phrase.py pins it).

    Broadcast the (tiny) phrase-term side onto the positional-postings scan —
    with pushdown_terms the distinct term set becomes an IN filter on the
    scan (parquet row-group skipping), so a 10^12-doc index reads only the
    phrase's terms.  groupBy (phrase_id, shard) keeps every kernel group
    shard-local and bounded.  ``phrase_tokens_col`` must tokenize the phrase
    the same way the postings were built (e.g. dictionary-FMM).
    """
    pt = phrase_terms(phrases, cfg, phrase_tokens_col)
    if pushdown_terms:
        terms = [r["term"] for r in pt.select("term").distinct().collect()]
        ppostings = ppostings.filter(F.col("term").isin(terms))
    rows = ppostings.join(F.broadcast(pt), "term", "inner")
    hits = rows.groupBy("phrase_id", "shard").applyInPandas(
        _phrase_kernel, "phrase_id long, doc_id long"
    )
    return hits.join(
        F.broadcast(phrases.select("phrase_id", "phrase")), "phrase_id"
    ).select("phrase_id", "phrase", "doc_id")


class PhraseQueryEngine:
    """Low-latency phrase point queries over built positional postings —
    the phrase twin of operators/wand.py::Bm25QueryEngine.

    Caches per-term positional posting rows on the driver across queries
    (first sight of a term = one term-filtered collect; repeats = zero Spark
    jobs) and runs the EXACT distributed kernel (_phrase_kernel) per
    (phrase, shard) group, so results are bit-identical to
    ``phrase_match_indexed`` (pinned in tests/test_phrase.py).

    Memory discipline (reference ``include/lrucache.hpp:31-57``): the cache
    is a byte-bounded LRU, and a query whose term set would not fit is
    size-PROBED with a tiny Spark aggregate and routed to the distributed
    path WITHOUT collecting — the driver never holds more than
    ``max_cache_bytes`` of postings, under any term-churn workload
    (tests/test_cache.py).
    """

    def __init__(
        self,
        ppostings: DataFrame,
        cfg: EngineConfig = DEFAULT,
        max_cache_bytes: int = 32 * 1024 * 1024,
    ):
        from searchenginesimple_spark.operators.cache import LruBytesCache

        self.ppostings = ppostings
        self.cfg = cfg
        self.cap = max_cache_bytes
        self._post = LruBytesCache(max_cache_bytes)  # term -> posting rows

    def _ensure(self, terms: list[str]) -> bool:
        """Make every term's postings cache-resident; False = this query's
        working set exceeds the budget (caller must use the distributed
        path).  Missing terms are size-probed BEFORE any collect."""
        missing = [t for t in terms if t not in self._post]
        need = sum(self._post.nbytes(t) for t in terms)
        if not missing:
            return True
        probe = (
            self.ppostings.filter(F.col("term").isin(missing))
            .agg(
                F.coalesce(
                    F.sum(
                        F.length("ids") + F.length("npos") + F.length("pos") + 64
                    ),
                    F.lit(0),
                ).alias("b")
            )
            .collect()[0]["b"]
        )
        if need + int(probe) > self.cap:
            return False
        rows = self.ppostings.filter(F.col("term").isin(missing)).collect()
        per_term: dict[str, list] = {t: [] for t in missing}
        for r in rows:
            per_term[r["term"]].append(r)
        for t in missing:
            nb = sum(len(r["ids"]) + len(r["npos"]) + len(r["pos"]) + 64 for r in per_term[t])
            self._post.put(t, per_term[t], nb, pinned=terms)
        return True

    def match(self, phrases: list[str]) -> pd.DataFrame:
        """→ pandas (phrase_id, phrase, doc_id), phrase_id = list position."""
        from searchenginesimple_spark.functions.tokenize import tokenize_py

        ptoks = [tokenize_py(p, self.cfg.token_re) for p in phrases]
        all_terms = sorted({t for toks in ptoks for t in toks})
        if not self._ensure(all_terms):
            spark = self.ppostings.sparkSession
            pdf = spark.createDataFrame(
                list(enumerate(phrases)), "phrase_id long, phrase string"
            )
            out = phrase_match_indexed(self.ppostings, pdf, self.cfg).toPandas()
            return out.sort_values(["phrase_id", "doc_id"]).reset_index(drop=True)

        cached = {t: self._post.get(t) or [] for t in all_terms}
        frames: list[pd.DataFrame] = []
        for pid, (phrase, toks) in enumerate(zip(phrases, ptoks)):
            offsets: dict[str, list[int]] = {}
            for off, t in enumerate(toks):
                offsets.setdefault(t, []).append(off)
            terms = sorted(offsets)
            if not terms:
                continue
            shards = sorted(
                {r["shard"] for t in terms for r in cached[t]}
            )
            for shard in shards:
                rows = [
                    {
                        "phrase_id": pid, "shard": shard, "term": t,
                        "offsets": offsets[t], "n_terms": len(terms),
                        "df": r["df"], "ids": r["ids"], "npos": r["npos"],
                        "pos": r["pos"],
                    }
                    for t in terms
                    for r in cached[t]
                    if r["shard"] == shard
                ]
                if rows:
                    res = _phrase_kernel(pd.DataFrame(rows))
                    if len(res):
                        res["phrase"] = phrase
                        frames.append(res)
        if not frames:
            return pd.DataFrame({"phrase_id": [], "phrase": [], "doc_id": []})
        out = pd.concat(frames, ignore_index=True)[["phrase_id", "phrase", "doc_id"]]
        return out.sort_values(["phrase_id", "doc_id"]).reset_index(drop=True)


def phrase_topk(index, ppostings: DataFrame, phrases: DataFrame,
                cfg: EngineConfig = DEFAULT) -> DataFrame:
    """BM25-ranked exact-phrase search → (query, rank, docID, score).

    Composition: the positional index supplies the candidate set (docs
    containing the phrase verbatim), the BM25 scorer ranks it — phrase
    candidates are by construction conjunctive matches, so the restriction
    is a pure left-semi narrowing of the dense scorer's candidate set.
    The ranked result a search frontend would actually serve for a quoted
    query.
    """
    from searchenginesimple_spark.operators.bm25 import bm25_topk

    hits = phrase_match_indexed(ppostings, phrases, cfg)
    cands = hits.select(F.col("phrase_id").alias("query_id"), "doc_id")
    queries = phrases.select(
        F.col("phrase_id").alias("query_id"), F.col("phrase").alias("query")
    )
    return bm25_topk(index, queries, cfg, candidates=cands)
