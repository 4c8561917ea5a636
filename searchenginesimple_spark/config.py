"""Engine-wide configuration.

One frozen dataclass carries every tunable so that the Spark pipeline, the
pure-Python oracle (oracle.py) and the DuckDB cross-check SQL all agree on the
exact same constants. The reference hard-codes its equivalents (top-k=10 at
``include/Page/WebPageQuery.hpp:121``, simhash Hamming threshold 3 at
``include/simhash/Simhasher.hpp:109``, zone=10 partitions at
``conf/files.json:9``); we make them explicit.
"""

from __future__ import annotations

from dataclasses import dataclass

# Tokenizer spec shared by engine, oracle and DuckDB SQL: lowercase, then
# extract identifier-shaped runs.  (SURVEY.md §2.2 case decision: the
# reference's byte-garbling "case transform" at Page.hpp:298-303 is a
# transcription bug; we implement its intent — case-insensitive matching.)
TOKEN_RE = r"[a-z_][a-z0-9_]*"

# CJK-capable mode (the reference is a *Chinese* search engine — jieba cut at
# Page.hpp:288, Dictionary.hpp:95, WebPageQuery.hpp:40): identifier runs ∪
# single CJK codepoints (unigram segmentation — the SQL-mirrorable analogue
# of a character-level Chinese index; conjunctive queries recover phrases).
# Selectable via EngineConfig.token_re; same pattern runs verbatim in Java
# regex, RE2/DuckDB, and Python re.
TOKEN_RE_CJK = r"[a-z_][a-z0-9_]*|[一-龥]"


@dataclass(frozen=True)
class EngineConfig:
    # --- BM25 scoring (SURVEY.md §7 scoring note) -------------------------
    k1: float = 1.2
    b: float = 0.75
    top_k: int = 10  # reference: WebPageQuery.hpp:121  min(10, size)
    # Scores are rounded to this many decimals before ranking so that the
    # rank order is reproducible across summation orders (Spark vs oracle
    # vs DuckDB).  1e-6 is ~1e9 × double ulp at BM25 magnitudes.
    score_decimals: int = 6

    # --- simhash dedup (SURVEY.md §2.6) -----------------------------------
    hamming_threshold: int = 3  # reference: Simhasher.hpp:109
    # Multi-block candidate scheme (Manku et al. 2007): B blocks, join on all
    # C(B, B−threshold) block subsets — exact recall at distance ≤ threshold
    # with ~2^32-key buckets (the naive 4×16-bit banding explodes past 10^6
    # docs).  B = threshold + 3 → 20 subset keys per fingerprint.
    n_blocks: int = 6

    # --- posting lists (north rule) ---------------------------------------
    block_size: int = 128
    # Doc-range shard span: shard = doc_id // shard_span.  The range salt of
    # the posting-build shuffle — bounds every (term, shard) group at
    # shard_span postings regardless of term hotness, and keeps shards in
    # global doc order so concatenation needs no merge shuffle.  (This range
    # shard IS the skew bound: no separate hot-term salting layer exists or
    # is needed.)
    shard_span: int = 16384  # docs per block-max block

    # --- stopword filter (reference Page.hpp:294,305; Dictionary.hpp:101,112)
    # Applied on the BUILD path only — the reference does not stop-filter the
    # query path (WebPageQuery.hpp:140-160), an asymmetry we preserve: a
    # stopword in a query simply finds no postings.  Empty by default so the
    # canonical driver entries are unaffected; pipelines opt in.
    stopwords: tuple[str, ...] = ()

    # --- checkpoint/resume (plans/build.py) --------------------------------
    # Shards committed per checkpoint batch: one Spark job + one metrics
    # append per batch; a crash re-does at most one batch.
    checkpoint_batch_shards: int = 64

    # --- tokenizer ----------------------------------------------------------
    # Token spec used by EVERY path (build, query, dict, simhash) — build and
    # query must agree or postings never match.  TOKEN_RE for pure source
    # code, TOKEN_RE_CJK for corpora with Chinese content.
    token_re: str = TOKEN_RE

    # --- layout ------------------------------------------------------------
    shuffle_partitions: int = 32
    # Filter mirroring the reference's short-document drop (Page.hpp:137-146).
    min_content_len: int = 10

    # --- tombstone scale guard (plans/delete.py, operators/wand.py) --------
    # Max deleted doc_ids the query paths will COLLECT to the driver (the
    # kernel fastpath / serving engines carry the set as per-shard arrays).
    # Past this, every path falls back to the distributed _del_by_shard_df
    # join — correct at any size, just not sub-second — and delete_docs
    # appends via a Spark write instead of a driver collect.  A mass
    # takedown (whole-repo delete, 10^6–10^8 ids) therefore degrades
    # latency, never the driver.  needs_compaction() trips at the same
    # threshold: compaction is the cure, the guard is the tourniquet.
    tombstone_fastpath_max: int = 100_000


DEFAULT = EngineConfig()
