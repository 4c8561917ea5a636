"""Pure-Python single-process reference oracle (SURVEY.md §5.2).

The executable spec of the reference's pipeline semantics (tokenize → dedup →
TF/DF → conjunctive intersect → top-k with doc_id tie-break; reference
lifecycle at SURVEY.md §3.1/§3.2) with the scorer swapped to BM25 per the
north rule.  The Spark engine must be rank-identical in docIDs and equal in
(rounded) scores against this oracle on the fixture corpus + query set.

Deliberately naive: dicts and loops, no numpy in the scoring path — so a bug
in the engine and a bug in the oracle cannot share code.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from searchenginesimple_spark.config import DEFAULT, EngineConfig
from searchenginesimple_spark.functions.simhash import simhash_py
from searchenginesimple_spark.functions.tokenize import tokenize_py


def dedup_survivors_oracle(
    docs: pd.DataFrame,
    cfg: EngineConfig = DEFAULT,
    text_col: str = "content",
    weighting: str = "tfidf",
) -> set[int]:
    """Simhash near-dup survivors under the canonical rule (SURVEY.md §2.6):
    keep d ⇔ simhash(d) != 0 and no e < d with hamming(e, d) ≤ threshold.
    O(n²) scan — the executable spec, not the algorithm."""
    if weighting == "tfidf":
        import math

        from searchenginesimple_spark.functions.simhash import simhash_weighted_py

        tfs = {
            int(d): Counter(tokenize_py(t))
            for d, t in zip(docs["doc_id"], docs[text_col])
        }
        n = len(tfs)  # N = total input docs (tfidf_fingerprints uses docs.count())
        tfs = {d: c for d, c in tfs.items() if c}
        dfc: Counter = Counter()
        for c in tfs.values():
            for t in c:
                dfc[t] += 1
        # integer-quantized idf weights — the engine's exact vote spec
        # (fingerprints_from_tf: floor(ln((N+1)/(df+1))·1e6 + 0.5))
        idf_w = {
            t: int(math.floor(math.log((n + 1.0) / (dfc[t] + 1.0)) * 1e6 + 0.5))
            for t in dfc
        }
        fps = {d: simhash_weighted_py(c, idf_w) for d, c in tfs.items()}
    else:
        fps = {
            int(d): simhash_py(t)
            for d, t in zip(docs["doc_id"], docs[text_col])
        }
    ids = sorted(d for d, f in fps.items() if f != 0)
    keep: set[int] = set()
    for d in ids:
        fd = fps[d]
        if all(bin((fps[e] ^ fd) & 0xFFFFFFFFFFFFFFFF).count("1") > cfg.hamming_threshold for e in ids if e < d):
            keep.add(d)
    return keep


def bm25_topk_oracle(
    docs: pd.DataFrame,
    queries: list[str],
    cfg: EngineConfig = DEFAULT,
    text_col: str = "content",
) -> pd.DataFrame:
    """docs(doc_id, <text_col>) + query strings → (query, rank, docID, score)."""
    tf: dict[int, Counter] = {}
    for doc_id, text in zip(docs["doc_id"], docs[text_col]):
        toks = tokenize_py(text)
        if toks:
            tf[int(doc_id)] = Counter(toks)

    dlen = {d: sum(c.values()) for d, c in tf.items()}
    n_docs = len(tf)
    avgdl = sum(dlen.values()) / n_docs if n_docs else 0.0
    df: Counter = Counter()
    postings: dict[str, list[int]] = {}
    for d, c in tf.items():
        for t in c:
            df[t] += 1
            postings.setdefault(t, []).append(d)

    def idf(t: str) -> float:
        return math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)

    out: list[tuple[str, int, int, float]] = []
    for q in queries:
        qtf = Counter(tokenize_py(q))
        terms = sorted(t for t in qtf if t in df)  # OOV prune; sorted = fixed sum order
        if not terms:
            continue  # fully-OOV short-circuit → no rows
        # conjunctive candidates: docs containing ALL indexed terms
        cand = set(postings[terms[0]])
        for t in terms[1:]:
            cand &= set(postings[t])
        scored: list[tuple[float, int]] = []
        for d in cand:
            s = 0.0
            for t in terms:
                f = tf[d][t]
                norm = f * (cfg.k1 + 1.0) / (
                    f + cfg.k1 * (1.0 - cfg.b + cfg.b * dlen[d] / avgdl)
                )
                s += qtf[t] * idf(t) * norm
            scored.append((round(s, cfg.score_decimals), d))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, d) in enumerate(scored[: cfg.top_k], start=1):
            out.append((q, rank, d, s))
    return pd.DataFrame(out, columns=["query", "rank", "docID", "score"])
