"""BM25 top-k over compressed sharded postings, with block-max pruning.

The scale path of the query engine (the dense join path in operators/bm25.py
is the correctness baseline; both must be rank-identical).  Physical shape:

  query terms (tiny)  ─broadcast join→  postings(term, shard)  rows
        → packed into ONE row per (query_id, shard) group (posting structs
          collected; the doc_stats_packed sidecar attached once per group)
        → mapInPandas scoring kernel (row-batched — no per-group dispatch)
        → per-shard top-k → global window top-k per query

Because shards are doc-id RANGES (operators/postings.py), conjunctive
intersection is shard-local and each kernel group is independent — the job
parallelizes over (query × shard) with no cross-shard state, exactly what a
1000-executor cluster wants.

Inside the kernel (numpy only):

* AND mode (reference semantics, WebPageQuery.hpp:62-84): intersect ascending
  by shard-df (rarest term seeds, cf. SURVEY.md §4 — improves on the
  reference's first-term seeding), gather tfs via binary search, exact BM25.
* OR mode: block-max pruned score-at-a-time — per-block BM25 upper bounds
  (from block_max_tf, the north rule's block-max metadata) bound every doc's
  best possible score; docs whose bound cannot reach the running kth exact
  score are never scored.  Same family as block-max WAND (Ding & Suel 2011):
  block upper bounds + threshold skipping, vectorized instead of
  document-at-a-time cursors.

Local top-k uses the SAME comparator as the global ranking (rounded score
desc, doc_id asc) so shard truncation can never disagree with the final
order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from searchenginesimple_spark.config import DEFAULT, EngineConfig
from searchenginesimple_spark.functions.codec import varbyte_decode
from searchenginesimple_spark.operators.bm25 import IndexStats, query_terms

_KERNEL_SCHEMA = "query_id long, doc_id long, score double"

# Worker-level decode memo (r6).  A batch of Q queries produces one kernel
# group per (query × shard): every group over the same shard re-decodes the
# IDENTICAL doc-stats sidecar, and every query sharing a term re-decodes that
# term's posting bytes — for a 1000-query batch that is ~1000× redundant
# varbyte work per shard, and it dominated the distributed batch path
# (measured r6: the 1000-query scaling batch spends most of its kernel time
# in decode, not scoring).  The memo is keyed by the compressed BYTES
# themselves (content hash — two identical buffers are the same postings by
# construction), lives at module level so a reused Python worker keeps it
# across tasks (guide §4.5), and is byte-bounded by the same LruBytesCache
# the serving engine uses, so a term-churn workload evicts instead of
# growing.  Decoded arrays are marked read-only — a kernel can never mutate
# a shared copy.  Execution-state only: nothing persists across processes or
# runs, and a miss is just a decode.
_DECODE_CACHE_MAX_BYTES = 128 * 1024 * 1024
_DECODE_LRU = None


def _decode_lru():
    global _DECODE_LRU
    if _DECODE_LRU is None:
        from searchenginesimple_spark.operators.cache import LruBytesCache

        _DECODE_LRU = LruBytesCache(_DECODE_CACHE_MAX_BYTES)
    return _DECODE_LRU


def _decode_ids(buf: bytes) -> np.ndarray:
    c = _decode_lru()
    key = ("ids", bytes(buf))
    v = c.get(key)
    if v is None:
        v = np.cumsum(varbyte_decode(buf), dtype=np.uint64).astype(np.int64)
        v.setflags(write=False)
        c.put(key, v, v.nbytes + len(key[1]) + 64)
    return v


def _decode_f64(buf: bytes) -> np.ndarray:
    """varbyte bytes → read-only float64 array (memoized, see above)."""
    c = _decode_lru()
    key = ("f64", bytes(buf))
    v = c.get(key)
    if v is None:
        v = varbyte_decode(buf).astype(np.float64)
        v.setflags(write=False)
        c.put(key, v, v.nbytes + len(key[1]) + 64)
    return v


def _bm25(tf, qtf, idf, dlen, avgdl, k1, b):
    return qtf * idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dlen / avgdl))


def _topk_local(doc_ids, scores, k, decimals):
    r = np.round(scores, decimals)
    order = np.lexsort((doc_ids, -r))[:k]
    return doc_ids[order], scores[order]


def _in_sorted(a: np.ndarray, sorted_b: np.ndarray) -> np.ndarray:
    """Membership mask of ``a`` in ascending ``sorted_b`` (searchsorted)."""
    pos = np.searchsorted(sorted_b, a)
    ok = pos < sorted_b.size
    out = np.zeros(a.size, dtype=bool)
    out[ok] = sorted_b[pos[ok]] == a[ok]
    return out


def _group_del_ids(pdf: pd.DataFrame) -> np.ndarray | None:
    """This group's tombstoned doc_ids (sorted int64), or None."""
    if "del_ids" not in pdf.columns:
        return None
    v = pdf["del_ids"].iloc[0]
    if v is None or len(v) == 0:
        return None
    return np.asarray(v, dtype=np.int64)


def _score_group(
    plist: list,
    ds_ids_buf,
    ds_dlens_buf,
    del_ids: np.ndarray | None,
    avgdl: float,
    n_terms: int,
    cfg: EngineConfig,
    mode: str,
):
    """Score ONE (query × shard) group → (doc_ids, scores) arrays or None.

    ``plist``: per matched term a mapping with keys qtf/idf/df/ids/tfs/
    block_max_tf.  This is the single scoring implementation behind BOTH
    the distributed packed-row kernel and the driver fastpath/serving
    engine (_driver_topk), so the paths can never diverge.
    """
    k1, b, k, dec = cfg.k1, cfg.b, cfg.top_k, cfg.score_decimals
    if mode == "and" and len(plist) < n_terms:
        return None  # some query term absent from this shard → no conjunctive hit
    ds_ids = _decode_ids(ds_ids_buf)
    ds_dlens = _decode_f64(ds_dlens_buf)

    plist = sorted(plist, key=lambda t: t["df"])  # rarest-first
    ids_l = [_decode_ids(t["ids"]) for t in plist]
    qtfs = np.array([t["qtf"] for t in plist], dtype=np.float64)
    idfs = np.array([t["idf"] for t in plist], dtype=np.float64)

    if mode == "and":
        cand = ids_l[0]
        for other in ids_l[1:]:
            cand = cand[_in_sorted(cand, other)]
            if cand.size == 0:
                return None
        # tombstones (plans/delete.py): live-docs filtering at score time,
        # the Lucene liveDocs discipline — postings stay compressed until
        # compaction, deleted docs never surface
        if del_ids is not None:
            cand = cand[~_in_sorted(cand, del_ids)]
            if cand.size == 0:
                return None
        dlen = ds_dlens[np.searchsorted(ds_ids, cand)]
        scores = np.zeros(cand.size, dtype=np.float64)
        for i, t in enumerate(plist):
            tfs = _decode_f64(t["tfs"])
            tf_c = tfs[np.searchsorted(ids_l[i], cand)]
            scores += _bm25(tf_c, qtfs[i], idfs[i], dlen, avgdl, k1, b)
        return _topk_local(cand, scores, k, dec)

    # --- OR mode: block-max pruned score-at-a-time --------------------
    # per-doc upper bound = Σ_t block_ub of the block containing the doc
    full = ds_ids  # superset of every posting list in this shard
    bound_full = np.zeros(full.size, dtype=np.float64)
    raw_pos_l = []
    for i, t in enumerate(plist):
        bmtf = np.asarray(t["block_max_tf"], dtype=np.float64)
        # optimistic dlen → 0: ub = qtf·idf·bmtf(k1+1)/(bmtf + k1(1−b));
        # strictly above any real score (real dlen ≥ 1, tf ≤ bmtf)
        block_ub = qtfs[i] * idfs[i] * (bmtf * (k1 + 1.0)) / (bmtf + k1 * (1.0 - b))
        per_post_ub = np.repeat(block_ub, cfg.block_size)[: ids_l[i].size]
        pos = np.searchsorted(full, ids_l[i])
        raw_pos_l.append(pos)
        np.add.at(bound_full, pos, per_post_ub)

    # candidates = docs matching ≥ 1 query term (bound > 0)
    cand_idx = np.nonzero(bound_full > 0)[0]
    if cand_idx.size == 0:
        return None
    remap = np.full(full.size, -1, dtype=np.int64)
    remap[cand_idx] = np.arange(cand_idx.size)
    union = full[cand_idx]
    bound = bound_full[cand_idx]
    pos_l = [remap[p] for p in raw_pos_l]
    # deleted docs stay IN the candidate set (posting positions keep
    # pointing at valid slots) but are excluded from theta and the final
    # cut — scoring a soon-compacted doc is cheaper than re-mapping
    live = None if del_ids is None else ~_in_sorted(union, del_ids)

    # score candidates in descending-bound waves until no unscored doc's
    # bound can beat the running kth exact score (margin = one rounding
    # quantum, so rounded-tie doc_id ordering can never be affected)
    margin = 10.0 ** (-dec)
    order = np.argsort(-bound, kind="stable")
    n = union.size
    width = max(4 * k, 64)
    scored_scores = np.full(n, -np.inf)
    hi = 0
    theta = -np.inf
    while hi < n:
        lo, hi = hi, min(n, hi + width)
        sel = order[lo:hi]
        if theta > -np.inf and bound[sel].max(initial=-np.inf) <= theta - margin:
            break
        mask = np.zeros(n, dtype=bool)
        mask[sel] = True
        part = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(plist):
            take = mask[pos_l[i]]
            if not take.any():
                continue
            tfs = _decode_f64(t["tfs"])[take]
            dlen = ds_dlens[cand_idx[pos_l[i][take]]]
            part[pos_l[i][take]] += _bm25(tfs, qtfs[i], idfs[i], dlen, avgdl, k1, b)
        scored_scores[sel] = part[sel]
        scored = scored_scores > -np.inf
        done = scored_scores[scored if live is None else scored & live]
        if done.size >= k:
            theta = np.partition(done, -k)[-k]
        width *= 2
    got = scored_scores > -np.inf
    if live is not None:
        got &= live
        if not got.any():
            return None
    return _topk_local(union[got], scored_scores[got], k, dec)


def _make_kernel(cfg: EngineConfig, mode: str):
    """Per-(query, shard)-group pandas kernel over EXPANDED rows (one row
    per matched term, sidecars repeated per row) — the shape _driver_topk
    feeds.  Thin adapter over _score_group."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
        plist = pdf[["qtf", "idf", "df", "ids", "tfs", "block_max_tf"]].to_dict(
            "records"
        )
        res = _score_group(
            plist,
            pdf["ds_ids"].iloc[0],
            pdf["ds_dlens"].iloc[0],
            _group_del_ids(pdf),
            float(pdf["avgdl"].iloc[0]),
            int(pdf["n_terms"].iloc[0]),
            cfg,
            mode,
        )
        if res is None:
            return empty
        top_ids, top_scores = res
        return pd.DataFrame(
            {"query_id": int(pdf["query_id"].iloc[0]), "doc_id": top_ids, "score": top_scores}
        )

    return kernel


def _make_packed_kernel(cfg: EngineConfig, mode: str, with_del: bool):
    """mapInPandas kernel over PACKED rows — one row per (query, shard)
    group carrying the term postings as an array of structs and the shard
    sidecar exactly once (r6).  The former applyInPandas shape paid one
    Python function dispatch per group and shipped the per-shard
    doc-stats sidecar once per TERM row; packing cut the 1000-query
    distributed batch's wall ~35-40 % (measured, guide §4.1: control how
    many bytes cross the boundary)."""

    def kernel(batches):
        for pdf in batches:
            ids_out: list = []
            scores_out: list = []
            qids_out: list = []
            del_col = pdf["del_ids"] if with_del else None
            for i in range(len(pdf)):
                dels = None
                if del_col is not None:
                    v = del_col.iloc[i]
                    if v is not None and len(v):
                        dels = np.asarray(v, dtype=np.int64)
                res = _score_group(
                    list(pdf["plist"].iloc[i]),
                    pdf["ds_ids"].iloc[i],
                    pdf["ds_dlens"].iloc[i],
                    dels,
                    float(pdf["avgdl"].iloc[i]),
                    int(pdf["n_terms"].iloc[i]),
                    cfg,
                    mode,
                )
                if res is None:
                    continue
                top_ids, top_scores = res
                qids_out.append(
                    np.full(top_ids.size, int(pdf["query_id"].iloc[i]), dtype=np.int64)
                )
                ids_out.append(top_ids)
                scores_out.append(top_scores)
            if qids_out:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(qids_out),
                        "doc_id": np.concatenate(ids_out),
                        "score": np.concatenate(scores_out),
                    }
                )

    return kernel


_OUT_SCHEMA = "query string, rank int, docID long, score double"


def _shard_of_col(cfg: EngineConfig):
    from searchenginesimple_spark.operators.postings import shard_of

    return shard_of(F.col("doc_id"), cfg)


def _del_by_shard_df(tombstones: DataFrame, cfg: EngineConfig) -> DataFrame:
    """(shard, del_ids: sorted array<long>) — the ONE grouping rule both the
    distributed join and the driver fastpath use, so they can never diverge
    on which docs are filtered."""
    return (
        tombstones.select("doc_id")
        .distinct()
        .withColumn("shard", _shard_of_col(cfg))
        .groupBy("shard")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("del_ids"))
    )


# Sentinel: the tombstone set exceeded cfg.tombstone_fastpath_max, so it was
# NOT collected — callers must route through the distributed join path.
DEL_TOO_BIG = object()


def _tombstones_small(tombstones: DataFrame, cfg: EngineConfig) -> bool:
    """True iff the deleted set fits under the driver-collect guard.  A
    limit(cap+1).count() — short-circuits at cap+1 rows, never scans a
    10^8-id takedown set to completion."""
    cap = cfg.tombstone_fastpath_max
    return tombstones.select("doc_id").limit(cap + 1).count() <= cap


def _collect_del_by_shard(
    tombstones: DataFrame | None, cfg: EngineConfig
) -> dict[int, list] | None | object:
    """Driver-side (shard → sorted deleted doc_ids) map for the fastpath /
    serving kernels.  Tombstone sets are compaction-bounded by contract,
    and this is where the contract is ENFORCED: past
    cfg.tombstone_fastpath_max the set is not collected at all — the
    DEL_TOO_BIG sentinel comes back and callers fall to the distributed
    _del_by_shard_df join (same grouping rule, so results are identical)."""
    if tombstones is None:
        return None
    if not _tombstones_small(tombstones, cfg):
        return DEL_TOO_BIG
    rows = _del_by_shard_df(tombstones, cfg).collect()
    return {int(r["shard"]): list(r["del_ids"]) for r in rows}


def _driver_topk(
    prows: list,
    dsp_rows: list,
    ts_rows: list,
    corpus_row,
    q_rows: list,
    cfg: EngineConfig,
    mode: str,
    del_by_shard: dict[int, list] | None = None,
) -> pd.DataFrame:
    """Small-query fast path: score collected posting rows on the driver.

    Reuses the EXACT distributed kernel (_make_kernel) per (query, shard)
    group and the same rounded-score/doc_id comparator, so results are
    bit-identical to the cluster path — only the orchestration differs.
    """
    from searchenginesimple_spark.functions.tokenize import tokenize_py

    idf = {r["term"]: r["idf"] for r in ts_rows}
    avgdl = float(corpus_row["avgdl"])
    by_shard: dict[int, dict] = {}
    for r in dsp_rows:
        by_shard[r["shard"]] = r
    p_by_term: dict[str, list] = {}
    for r in prows:
        p_by_term.setdefault(r["term"], []).append(r)

    kernel = _make_kernel(cfg, mode)
    out: list[pd.DataFrame] = []
    for q in q_rows:
        qtoks = tokenize_py(q["query"], cfg.token_re)
        qtf: dict[str, int] = {}
        for t in qtoks:
            qtf[t] = qtf.get(t, 0) + 1
        terms = sorted(t for t in qtf if t in idf)
        if not terms:
            continue
        shards = sorted(
            {r["shard"] for t in terms for r in p_by_term.get(t, [])}
        )
        for shard in shards:
            rows = []
            for t in terms:
                for r in p_by_term.get(t, []):
                    if r["shard"] != shard:
                        continue
                    ds = by_shard[shard]
                    rows.append(
                        {
                            "query_id": q["query_id"], "shard": shard, "term": t,
                            "qtf": qtf[t], "idf": idf[t], "df": r["df"],
                            "ids": r["ids"], "tfs": r["tfs"],
                            "block_last_id": r["block_last_id"],
                            "block_max_tf": r["block_max_tf"],
                            "ds_ids": ds["ids"], "ds_dlens": ds["dlens"],
                            "avgdl": avgdl, "n_terms": len(terms),
                            "del_ids": (del_by_shard or {}).get(shard),
                        }
                    )
            if rows:
                res = kernel(pd.DataFrame(rows))
                if len(res):
                    res["query"] = q["query"]
                    out.append(res)
    if not out:
        return pd.DataFrame(columns=["query", "rank", "docID", "score"])
    allr = pd.concat(out, ignore_index=True)
    allr["score_r"] = allr["score"].round(cfg.score_decimals)
    allr = allr.sort_values(
        ["query_id", "score_r", "doc_id"], ascending=[True, False, True]
    )
    allr["rank"] = allr.groupby("query_id").cumcount() + 1
    allr = allr[allr["rank"] <= cfg.top_k]
    return pd.DataFrame(
        {
            "query": allr["query"],
            "rank": allr["rank"].astype("int32"),
            "docID": allr["doc_id"].astype("int64"),
            "score": allr["score_r"].astype("float64"),
        }
    )


class Bm25QueryEngine:
    """Low-latency point-query serving over a built index.

    ``bm25_topk_compressed`` launches 5–7 Spark jobs per call (term pushdown
    collect, fastpath sizing agg, postings/dsp/term_stats/corpus collects) —
    ~100–300 ms of job-launch latency each, which IS the single-query p95 at
    small scale.  A serving process (the reference keeps its whole index in
    RAM, ``WebServer.cc``) should instead cache the query-relevant slices on
    the driver across queries:

    * corpus scalars       — collected once at construction (1 row);
    * per-term idf/df      — fetched on first sight of a term, LRU-bounded
      by entry count;
    * per-term postings    — same, size-guarded by df (≤ ~20 B/posting
      varbyte upper bound) so a hot term over 10^12 docs falls back to the
      DISTRIBUTED path instead of a driver collect; cached in a byte-bounded
      LRU (reference ``include/lrucache.hpp:31-57``) so a TERM-CHURN
      workload evicts cold terms instead of growing without bound;
    * per-shard doc stats  — fetched for shards the cached postings touch,
      same LRU policy.

    Eviction changes what is cached, never results: evicted terms are simply
    re-fetched on next sight (tests/test_cache.py pins bit-identity under
    churn).  Scoring reuses the EXACT distributed kernel per (query, shard)
    group (_driver_topk → _make_kernel), so results are bit-identical to
    ``bm25_topk_compressed`` — verified in tests/test_postings.py.
    A repeated query costs ZERO Spark jobs; a novel query costs ≤ 3 tiny
    term-filtered collects.
    """

    # conservative varbyte upper bound: ids (≤ 9 B/value delta-varbyte is
    # pathological; ≤ 10 covers ids+tfs together at realistic deltas)
    BYTES_PER_POSTING = 20
    _OOV = object()  # cached negative term_stats lookup

    def __init__(
        self,
        postings: DataFrame,
        doc_stats_packed: DataFrame,
        index: IndexStats,
        cfg: EngineConfig = DEFAULT,
        mode: str = "and",
        fastpath_max_bytes: int = 32 * 1024 * 1024,
        cache_max_bytes: int = 128 * 1024 * 1024,
        meta_max_terms: int = 1_000_000,
        tombstones: DataFrame | None = None,
    ):
        from searchenginesimple_spark.operators.cache import LruBytesCache

        self.postings = postings
        self.dsp = doc_stats_packed
        self.index = index
        self.cfg = cfg
        self.mode = mode
        self.cap = fastpath_max_bytes
        self.corpus_row = index.corpus.collect()[0]
        # live-docs filter (plans/delete.py): collected ONCE — deletes made
        # after construction need refresh_tombstones() (the same visibility
        # point a Lucene searcher reopen gives).  A tombstone set past
        # cfg.tombstone_fastpath_max is NOT collected: the engine pins
        # every query to the distributed path until compaction shrinks it
        # (correct at any size; compact_index is the latency cure).
        self._tombstones = tombstones
        dbs = _collect_del_by_shard(tombstones, cfg)
        self._del_too_big = dbs is DEL_TOO_BIG
        self._del_by_shard = None if dbs is DEL_TOO_BIG else dbs
        # meta rows are ~64 B each; nbytes=1 per entry makes max_bytes an
        # entry-count cap
        self._meta = LruBytesCache(meta_max_terms)
        self._post = LruBytesCache(cache_max_bytes)  # term -> postings rows
        self._ds = LruBytesCache(cache_max_bytes)  # shard -> dsp row

    @staticmethod
    def _row_bytes(row) -> int:
        """Driver-memory estimate for a collected Row: binary payloads + a
        flat per-row object overhead."""
        return 64 + sum(len(v) for v in row if isinstance(v, (bytes, bytearray)))

    def _ensure_terms(self, terms: list[str]) -> dict[str, object]:
        meta: dict[str, object] = {}
        new = []
        for t in terms:
            v = self._meta.get(t)
            if v is None:
                new.append(t)
            else:
                meta[t] = v
        if new:
            found = {
                r["term"]: r
                for r in self.index.term_stats.filter(F.col("term").isin(new)).collect()
            }
            for t in new:
                v = found.get(t, self._OOV)
                self._meta.put(t, v, 1, pinned=terms)
                meta[t] = v
        return meta

    def _ensure_postings(self, terms: list[str]) -> list:
        missing = [t for t in terms if t not in self._post]
        if missing:
            rows = self.postings.filter(F.col("term").isin(missing)).collect()
            per_term: dict[str, list] = {t: [] for t in missing}
            for r in rows:
                per_term[r["term"]].append(r)
            for t in missing:
                nb = sum(self._row_bytes(r) for r in per_term[t])
                self._post.put(t, per_term[t], nb, pinned=terms)
        prows = [r for t in terms for r in self._post.get(t)]
        shards = sorted({r["shard"] for r in prows})
        miss_sh = [s for s in shards if s not in self._ds]
        if miss_sh:
            for r in self.dsp.filter(F.col("shard").isin(miss_sh)).collect():
                self._ds.put(r["shard"], r, self._row_bytes(r), pinned=shards)
        return prows

    def query(self, queries: list[str]) -> pd.DataFrame:
        """→ pandas (query, rank, docID, score); bit-identical to the
        distributed path.  Falls back to it when cached-size guards trip."""
        from searchenginesimple_spark.functions.tokenize import tokenize_py

        all_terms = sorted(
            {t for q in queries for t in tokenize_py(q, self.cfg.token_re)}
        )
        meta = self._ensure_terms(all_terms)
        live = [t for t in all_terms if meta[t] is not self._OOV]
        est = sum(meta[t]["df"] for t in live) * self.BYTES_PER_POSTING
        if est > self.cap or self._del_too_big:
            spark = self.index.term_stats.sparkSession
            qdf = spark.createDataFrame(
                list(enumerate(queries)), "query_id long, query string"
            )
            return bm25_topk_compressed(
                self.postings, self.dsp, self.index, qdf, self.cfg, self.mode,
                fastpath_max_bytes=None, tombstones=self._tombstones,
            ).toPandas()
        prows = self._ensure_postings(live)
        ds_rows = [
            self._ds.get(s) for s in sorted({r["shard"] for r in prows})
        ]
        ts_rows = [meta[t] for t in live]
        q_rows = [{"query_id": i, "query": q} for i, q in enumerate(queries)]
        return _driver_topk(
            prows, [r for r in ds_rows if r is not None], ts_rows,
            self.corpus_row, q_rows, self.cfg, self.mode,
            del_by_shard=self._del_by_shard,
        )

    def refresh_tombstones(self, tombstones: DataFrame | None) -> None:
        """Make a new tombstone set visible to this engine (postings/stats
        caches are unaffected — deletes filter at score time).  An over-cap
        set pins queries to the distributed path (see __init__)."""
        self._tombstones = tombstones
        dbs = _collect_del_by_shard(tombstones, self.cfg)
        self._del_too_big = dbs is DEL_TOO_BIG
        self._del_by_shard = None if dbs is DEL_TOO_BIG else dbs

    def query_df(self, spark, queries: list[str]) -> DataFrame:
        return spark.createDataFrame(self.query(queries), _OUT_SCHEMA)


def bm25_topk_compressed(
    postings: DataFrame,
    doc_stats_packed: DataFrame,
    index: IndexStats,
    queries: DataFrame,
    cfg: EngineConfig = DEFAULT,
    mode: str = "and",
    query_col: str = "query",
    pushdown_terms: bool = True,
    fastpath_max_bytes: int | None = 32 * 1024 * 1024,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """Compressed-path BM25 top-k → (query, rank, docID, score).

    fastpath_max_bytes: when the term-filtered postings fit under this size,
    score on the driver with the same kernel (bit-identical results) instead
    of shuffling — sub-second point-query latency.  Set None to force the
    distributed path (always the path when postings exceed the cap, e.g. a
    hot term over 10^12 docs).

    tombstones: optional (doc_id) table of deleted docs (plans/delete.py) —
    filtered at score time inside the kernel (live-docs discipline), so
    deleted docs never surface and top-k backfills with live docs, without
    touching the compressed postings until compaction.  Between compactions
    the tombstone set is small by contract (compact_index bounds it), so it
    broadcasts as per-shard sorted arrays.
    """
    # JVM tokenizer on the (tiny) query side: same spec as the build-side
    # pandas UDF (tested identical), avoids a python stage per query batch
    qt = query_terms(queries, query_col, use_pandas_udf=False, token_re=cfg.token_re)
    qt_rows = None
    if pushdown_terms or fastpath_max_bytes is not None:
        # materialize the (tiny) tokenized query side ONCE and push its
        # distinct terms into the postings scan as an IN filter → parquet
        # row-group min/max skipping turns the full-index scan into a
        # selective read.  The collected rows also feed the distributed
        # plan's query-side relations below (r6): the former shape
        # re-analyzed and re-executed the tokenize⋈term_stats subtree for
        # every broadcast build — ~10 driver jobs and a 2 s planning gap
        # per 1000-query batch at 1 core, all fixed cost (guide §1.2).
        qt_rows = qt.collect()
        terms = sorted({r["term"] for r in qt_rows})
        postings = postings.filter(F.col("term").isin(terms))

    # one guard decision shared by the fastpath gate and the distributed
    # join's broadcast hint: an over-cap tombstone set is never collected
    # and never broadcast (the dict itself is only materialized if the
    # fastpath is actually taken)
    del_small = tombstones is None or _tombstones_small(tombstones, cfg)
    ts_rows = None
    if fastpath_max_bytes is not None and del_small:
        # Two-tier size gate (r6): term_stats rows are needed by the
        # fastpath anyway, and Σdf · BYTES_PER_POSTING is a conservative
        # UPPER bound on the postings bytes (the serving engine's guard,
        # Bm25QueryEngine) — when even the over-estimate fits, the exact
        # postings-scan sizing job is provably redundant and is skipped
        # (one fewer Spark job per batch; job launch IS the latency at
        # small batch sizes).  Only the est > cap > actual band still pays
        # the exact agg, so the path decision — and therefore the result,
        # which is bit-identical on both paths anyway — never changes.
        ts_rows = index.term_stats.filter(F.col("term").isin(terms)).collect()
        est = sum(int(r["df"]) for r in ts_rows) * Bm25QueryEngine.BYTES_PER_POSTING
        fits = est <= fastpath_max_bytes
        if not fits:
            sz_row = postings.agg(
                F.sum(F.length("ids") + F.length("tfs")).alias("sz")
            ).collect()[0]
            fits = int(sz_row["sz"] or 0) <= fastpath_max_bytes
        if fits:
            spark = queries.sparkSession
            prows = postings.collect()
            shards = sorted({r["shard"] for r in prows})
            dsp_rows = (
                doc_stats_packed.filter(F.col("shard").isin(shards)).collect()
                if shards
                else []
            )
            corpus_row = index.corpus.collect()[0]
            q_rows = queries.select("query_id", query_col).withColumnRenamed(
                query_col, "query"
            ).collect()
            pdf = _driver_topk(
                prows, dsp_rows, ts_rows, corpus_row, q_rows, cfg, mode,
                del_by_shard=_collect_del_by_shard(tombstones, cfg),
            )
            return spark.createDataFrame(pdf, _OUT_SCHEMA)
    spark = queries.sparkSession
    if qt_rows is not None:
        # Query-side relations as LOCAL relations (r6, guide §1.2/§2.4):
        # qt is already collected (the pushdown above), so qt_idx / n_terms
        # / the final query-string join are built from driver rows — their
        # broadcasts materialize from a LocalTableScan with NO Spark job
        # and no re-analysis of the tokenize⋈term_stats subtree (formerly
        # re-executed per broadcast: ~10 driver jobs + ~2 s planning per
        # batch at 1 core, pure fixed cost).  Values are the engine's own
        # collected output, so the plan's inputs are identical.
        if ts_rows is None:
            ts_rows = index.term_stats.filter(F.col("term").isin(terms)).collect()
        idf_map = {r["term"]: float(r["idf"]) for r in ts_rows}
        qt_idx_rows = [
            (int(r["query_id"]), r["term"], int(r["qtf"]), idf_map[r["term"]])
            for r in qt_rows
            if r["term"] in idf_map
        ]
        nt: dict[int, int] = {}
        for qid, _t, _q, _i in qt_idx_rows:
            nt[qid] = nt.get(qid, 0) + 1
        # arrow_local_df, NOT createDataFrame(list): the list path builds a
        # Python-RDD-backed frame whose broadcast materialization runs a
        # multi-task Python conversion job (~0.5 s each at 4 cores —
        # measured); the Arrow path ships one JVM-deserialized batch.
        # n_terms rides qt_idx as a per-row column — one relation, one
        # broadcast, one fewer join than the former separate-agg shape.
        from searchenginesimple_spark.sources.io import arrow_local_df

        qt_idx = arrow_local_df(
            spark,
            [(r[0], r[1], r[2], r[3], nt[r[0]]) for r in qt_idx_rows],
            "query_id long, term string, qtf int, idf double, n_terms int",
        )
        n_terms = None  # folded into qt_idx
        qmap = arrow_local_df(
            spark,
            sorted({(int(r["query_id"]), r[query_col]) for r in qt_rows}),
            f"query_id long, {query_col} string",
        )
    else:
        qt_idx = F.broadcast(qt).join(
            index.term_stats.select("term", "idf"), "term", "inner"
        )
        n_terms = qt_idx.groupBy("query_id").agg(
            F.count("*").cast("int").alias("n_terms")
        )
        qmap = queries.select("query_id", query_col)

    # Packed-group shape (r6): collect each (query, shard) group's matched
    # term postings into ONE row of structs, attach the shard's doc-stats
    # sidecar to that row exactly once, and score the rows with mapInPandas.
    # The former shape joined the sidecar onto every TERM row and ran
    # applyInPandas per (query, shard) — for a Q-query batch that shipped
    # each shard sidecar ~Q×terms times through the shuffle and the Arrow
    # boundary and paid one Python dispatch per group (measured r6: ~70 %
    # of the 1000-query batch wall was this plumbing, not scoring; packing
    # cut the batch ~35-40 %).  block_last_id is no longer shipped at all —
    # the kernel never reads it.
    dsp2 = doc_stats_packed.select(
        "shard", F.col("ids").alias("ds_ids"), F.col("dlens").alias("ds_dlens")
    )
    with_del = tombstones is not None
    if with_del:
        # per-shard arrays are bounded at shard_span ids each, but an
        # over-cap TOTAL set would be a multi-GB broadcast — shuffle-join
        # it on shard instead (kernel input is identical either way)
        dbs = _del_by_shard_df(tombstones, cfg)
        if del_small:
            dbs = F.broadcast(dbs)
        dsp2 = dsp2.join(dbs, "shard", "left")
    joined = postings.join(F.broadcast(qt_idx), "term", "inner")
    if n_terms is not None:
        joined = joined.join(F.broadcast(n_terms), "query_id")
    packed = (
        joined.groupBy("query_id", "shard", "n_terms")
        .agg(
            F.collect_list(
                F.struct("qtf", "idf", "df", "ids", "tfs", "block_max_tf")
            ).alias("plist")
        )
        .join(dsp2, "shard")
        .crossJoin(F.broadcast(index.corpus.select("avgdl")))
    )
    kernel = _make_packed_kernel(cfg, mode, with_del)
    local = packed.mapInPandas(kernel, _KERNEL_SCHEMA)

    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), cfg.score_decimals)), F.asc("doc_id")
    )
    ranked = (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cfg.top_k)
        .join(F.broadcast(qmap), "query_id")
    )
    return ranked.select(
        F.col(query_col).alias("query"),
        F.col("rank").cast("int").alias("rank"),
        F.col("doc_id").cast("long").alias("docID"),
        F.round("score", cfg.score_decimals).cast("double").alias("score"),
    )
