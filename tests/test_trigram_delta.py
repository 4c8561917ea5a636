"""LSM-style incremental trigram index maintenance (operators/trigram.py:
append_trigram_delta / read_trigram_index / compact_trigram_index).

The soundness argument under test: the exact-verify stage prunes every
stale-posting artifact, so the ONLY invariant appends must keep is "every
current document's postings exist in base ∪ deltas".  Each test pins
search-over-shards ≡ brute-force scan over the CURRENT docstore through
adds, replacements, deletions, and compaction; compaction additionally
must converge to exactly the fresh-rebuild index (postings set AND df
stats — approximation is allowed only while deltas are open).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.operators.trigram import (
    append_trigram_delta,
    build_trigram_index,
    compact_trigram_index,
    read_trigram_index,
    trigram_search,
    trigram_search_bruteforce,
    write_trigram_index,
)

BASE_DOCS = [
    (1, "def alpha_handler(x): return unique_marker_one"),
    (2, "class BetaServer: stale_needle_gone lives here"),
    (3, "def gamma(): return shared_prefix_token"),
    (4, "doomed_document_token will be deleted entirely"),
]
# doc 2 replaced (old content had stale_needle_gone; new has fresh_needle_new
# AND keeps 'BetaServer' — the base∪delta duplicate-pair case), doc 4 deleted,
# doc 5 brand new.
CURRENT_DOCS = [
    (1, "def alpha_handler(x): return unique_marker_one"),
    (2, "class BetaServer: fresh_needle_new lives here"),
    (3, "def gamma(): return shared_prefix_token"),
    (5, "def delta_only_doc(): return appended_marker"),
]
DELTA_DOCS = [CURRENT_DOCS[1], CURRENT_DOCS[3]]

NEEDLES = [
    (0, "unique_marker_one"),   # base-only doc, untouched
    (1, "stale_needle_gone"),   # ONLY in replaced doc's OLD content → 0 hits
    (2, "fresh_needle_new"),    # ONLY in replaced doc's NEW content → delta
    (3, "BetaServer"),          # in old AND new content of doc 2 → exactly 1
    (4, "doomed_document"),     # deleted doc → 0 hits
    (5, "appended_marker"),     # new doc → delta
    (6, "return"),              # spans base and delta docs
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, content string")


def _needles(spark):
    return spark.createDataFrame(NEEDLES, "needle_id long, needle string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def idx_path(tmp_path):
    return str(tmp_path / "tri_idx")


def _build_base_and_delta(spark, idx_path):
    base_docs = _docs(spark, BASE_DOCS)
    raw, _ = build_trigram_index(base_docs)
    write_trigram_index(raw, idx_path)
    append_trigram_delta(_docs(spark, DELTA_DOCS), idx_path, "d001")


def test_search_over_shards_equals_scan(spark, idx_path):
    _build_base_and_delta(spark, idx_path)
    current = _docs(spark, CURRENT_DOCS)
    postings, stats = read_trigram_index(spark, idx_path)
    got = _rows(trigram_search(current, postings, stats, _needles(spark)))
    want = _rows(trigram_search_bruteforce(current, _needles(spark)))
    assert got == want
    # the scenario is only meaningful if it exercises every case:
    by_needle = {}
    for needle_id, _, doc_id, _ in want:
        by_needle.setdefault(needle_id, set()).add(doc_id)
    assert by_needle.get(0) == {1}
    assert 1 not in by_needle          # stale content unreachable
    assert by_needle.get(2) == {2}     # replacement indexed via delta
    assert by_needle.get(3) == {2}     # base∪delta duplicate pair: exactly once
    assert 4 not in by_needle          # deleted doc unreachable
    assert by_needle.get(5) == {5}     # appended doc found


def test_multiple_deltas_stack(spark, idx_path):
    _build_base_and_delta(spark, idx_path)
    extra = [(6, "def second_delta(): return second_marker")]
    append_trigram_delta(_docs(spark, extra), idx_path, "d002")
    current = _docs(spark, CURRENT_DOCS + extra)
    needles = spark.createDataFrame(
        NEEDLES + [(7, "second_marker")], "needle_id long, needle string"
    )
    postings, stats = read_trigram_index(spark, idx_path)
    got = _rows(trigram_search(current, postings, stats, needles))
    want = _rows(trigram_search_bruteforce(current, needles))
    assert got == want


def test_compaction_converges_to_fresh_rebuild(spark, idx_path, tmp_path):
    _build_base_and_delta(spark, idx_path)
    current = _docs(spark, CURRENT_DOCS)
    postings, stats = compact_trigram_index(spark, idx_path)

    fresh_raw, _ = build_trigram_index(current)
    fresh_p, fresh_s = write_trigram_index(fresh_raw, str(tmp_path / "fresh"))
    # NOTE: compaction cannot know about doc 4's deletion (it is absent from
    # the deltas) — stale postings for DELETED docs survive until the caller
    # compacts against a doc list.  They remain harmless (verify prunes).
    doc4 = F.col("doc_id") != 4
    assert _rows(postings.filter(doc4)) == _rows(fresh_p)
    assert _rows(stats) != [] and _rows(
        postings.filter(doc4).groupBy("trigram").count()
    ) == _rows(fresh_p.groupBy("trigram").count())

    # deltas cleared, search still ≡ scan
    from searchenginesimple_spark.operators.trigram import _fs

    fs, dbase, _ = _fs(spark, f"{idx_path}/deltas")
    assert not fs.exists(dbase)
    got = _rows(trigram_search(current, postings, stats, _needles(spark)))
    want = _rows(trigram_search_bruteforce(current, _needles(spark)))
    assert got == want


def test_compact_without_deltas_is_noop(spark, idx_path):
    base_docs = _docs(spark, BASE_DOCS)
    raw, _ = build_trigram_index(base_docs)
    write_trigram_index(raw, idx_path)
    before = _rows(spark.read.parquet(f"{idx_path}/postings"))
    postings, stats = compact_trigram_index(spark, idx_path)
    assert _rows(postings) == before


def test_replaced_doc_df_exact_after_compact(spark, idx_path):
    """Open deltas may inflate df (documented); compaction must restore the
    exact unique-pair df for every trigram of the replaced doc."""
    _build_base_and_delta(spark, idx_path)
    _, stats_open = read_trigram_index(spark, idx_path)
    # 'Bet' occurs in doc 2's old AND new content → df inflated to 2 while open
    open_df = {r["trigram"]: r["df"] for r in stats_open.collect()}
    assert open_df["Bet"] == 2
    _, stats_c = compact_trigram_index(spark, idx_path)
    compact_df = {r["trigram"]: r["df"] for r in stats_c.collect()}
    assert compact_df["Bet"] == 1


def test_metrics_pin_range_clustering(spark, idx_path):
    """The metrics table's per-file trigram ranges must be pairwise
    DISJOINT after a clustered write — the inspectable form of the
    range-clustering claim (row-group pruning confines a needle's scan)."""
    rows = [(i, f"document number {i} with text body_{i} trailing") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    raw, _ = build_trigram_index(docs)
    write_trigram_index(raw, idx_path, partitions=4)
    m = spark.read.parquet(f"{idx_path}/metrics").collect()
    assert len(m) >= 2
    assert sum(r["n_postings"] for r in m) == spark.read.parquet(
        f"{idx_path}/postings"
    ).count()
    ranges = sorted((r["min_trigram"], r["max_trigram"]) for r in m)
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {hi1!r} > {lo2!r}"


def test_read_supersedes_base_without_full_distinct(spark, idx_path):
    """Open-delta reads drop superseded base rows via a broadcast anti-join
    (never a whole-index distinct): a replaced doc's postings must equal
    exactly its NEW content's trigram set, and the plan must show the
    broadcast anti-join rather than an index-wide dedup aggregation."""
    _build_base_and_delta(spark, idx_path)
    postings, _ = read_trigram_index(spark, idx_path)
    doc2 = {r["trigram"] for r in postings.filter("doc_id = 2").collect()}
    fresh2, _ = build_trigram_index(_docs(spark, [CURRENT_DOCS[1]]))
    want2 = {r["trigram"] for r in fresh2.collect()}
    assert doc2 == want2  # no stale trigrams, no duplicates, nothing missing

    plan = postings._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan
    # the only aggregation allowed is over the SMALL delta union: no
    # HashAggregate keyed on the full (trigram, doc_id) base
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_boolean_search_over_shards_equals_scan(spark, idx_path):
    """The query algebra composes with the LSM shards through the same
    (postings, stats) seam: boolean_search over base ∪ delta ≡ boolean
    scan over the CURRENT docstore, including negation against stale
    content and a conjunct satisfied only by delta postings."""
    from searchenginesimple_spark.operators.boolquery import (
        boolean_search,
        boolean_search_bruteforce,
    )

    _build_base_and_delta(spark, idx_path)
    current = _docs(spark, CURRENT_DOCS)
    postings, stats = read_trigram_index(spark, idx_path)
    queries = [
        (0, "BetaServer fresh_needle_new"),   # replaced doc: new content only
        (1, "return -stale_needle_gone"),     # negation vs stale content
        (2, "stale_needle_gone OR doomed_document"),  # both unreachable → empty
        (3, "appended_marker OR unique_marker_one"),  # delta ∪ base union
        (4, "sym:delta_only_doc"),            # symbol defined only in the delta doc
    ]
    got = _rows(boolean_search(current, postings, stats, queries))
    want = _rows(boolean_search_bruteforce(current, queries))
    assert got == want
    by_qid = {}
    for qid, _, doc_id in want:
        by_qid.setdefault(qid, set()).add(doc_id)
    assert by_qid.get(0) == {2}
    assert by_qid.get(1) == {1, 3, 5}  # the current docs containing 'return'
    assert 2 not in by_qid
    assert by_qid.get(3) == {1, 5}
    assert by_qid.get(4) == {5}


def test_compact_recovers_crashed_swap(spark, idx_path):
    """compact_trigram_index commits the re-clustered postings to a fresh
    dir and swaps it in (delete old → rename).  A crash BETWEEN those two
    steps leaves postings_compacted/_SUCCESS and no postings dir; the next
    compact must finish the swap, re-apply the still-present deltas
    idempotently, and converge to the fresh-rebuild index."""
    import os
    import shutil

    _build_base_and_delta(spark, idx_path)
    # simulate the crash state: a COMMITTED compacted dir, postings gone
    # (the committed content of a crashed run is the pre-delta base here —
    # recovery only needs _SUCCESS + deltas to finish correctly)
    shutil.move(f"{idx_path}/postings", f"{idx_path}/postings_compacted")
    assert os.path.exists(f"{idx_path}/postings_compacted/_SUCCESS")

    # the READ path heals the swap first (queries never wait for a
    # re-compaction): read_trigram_index on the crashed state serves
    # base ∪ open deltas correctly
    healed_p, healed_s = read_trigram_index(spark, idx_path)
    assert os.path.exists(f"{idx_path}/postings")
    assert not os.path.exists(f"{idx_path}/postings_compacted")
    current0 = _docs(spark, CURRENT_DOCS)
    got0 = _rows(trigram_search(current0, healed_p, healed_s, _needles(spark)))
    want0 = _rows(trigram_search_bruteforce(current0, _needles(spark)))
    assert got0 == want0

    # re-create the crash state and let compact itself recover it
    shutil.move(f"{idx_path}/postings", f"{idx_path}/postings_compacted")
    compact_trigram_index(spark, idx_path)
    assert not os.path.exists(f"{idx_path}/postings_compacted")
    assert not os.path.exists(f"{idx_path}/deltas")

    current = _docs(spark, CURRENT_DOCS)
    fresh_p, fresh_s = build_trigram_index(current)
    got_p, _ = read_trigram_index(spark, idx_path)
    # doc 4's deletion is invisible to compaction (absent from deltas);
    # its stale postings remain and verify prunes them — same NOTE as
    # test_compaction_converges_to_fresh_rebuild
    not4 = F.col("doc_id") != 4
    assert _rows(got_p.filter(not4)) == _rows(fresh_p)

    # the OTHER crash state: an UNCOMMITTED partial compacted dir (no
    # _SUCCESS) is discarded and the compact re-runs from base ∪ deltas
    _build_base_and_delta(spark, str(idx_path) + "2")
    os.makedirs(f"{idx_path}2/postings_compacted")
    with open(f"{idx_path}2/postings_compacted/part-junk.parquet", "w") as f:
        f.write("not parquet")
    compact_trigram_index(spark, f"{idx_path}2")
    got_p2, _ = read_trigram_index(spark, f"{idx_path}2")
    assert _rows(got_p2.filter(not4)) == _rows(fresh_p)


def test_read_never_deletes_live_compaction_output(spark, idx_path):
    """ADVICE r5: a reader racing a live compact_trigram_index must not
    destroy the in-flight compaction's output.  The read path heals ONLY
    the state that blocks reads (committed compacted dir + postings gone);
    both discard cases — an uncommitted partial write, and a committed dir
    while postings still exists — are left for the compact entry point,
    because either may belong to a LIVE concurrent writer."""
    import os

    _build_base_and_delta(spark, idx_path)
    current = _docs(spark, CURRENT_DOCS)
    want = _rows(trigram_search_bruteforce(current, _needles(spark)))

    # case 1: uncommitted partial compacted dir (a live writer mid-write)
    os.makedirs(f"{idx_path}/postings_compacted")
    with open(f"{idx_path}/postings_compacted/part-inflight.parquet", "w") as f:
        f.write("in-flight")
    p, s = read_trigram_index(spark, idx_path)
    assert os.path.exists(f"{idx_path}/postings_compacted/part-inflight.parquet")
    assert _rows(trigram_search(current, p, s, _needles(spark))) == want

    # case 2: committed compacted dir while postings still exists (a live
    # writer between its _SUCCESS commit and the delete-old step)
    open(f"{idx_path}/postings_compacted/_SUCCESS", "w").close()
    p, s = read_trigram_index(spark, idx_path)
    assert os.path.exists(f"{idx_path}/postings_compacted/_SUCCESS")
    assert os.path.exists(f"{idx_path}/postings")
    assert _rows(trigram_search(current, p, s, _needles(spark))) == want

    # the compact entry point still owns the discard: it clears the junk
    # dir and converges (single-compaction-writer discipline)
    compact_trigram_index(spark, idx_path)
    assert not os.path.exists(f"{idx_path}/postings_compacted")
    p, s = read_trigram_index(spark, idx_path)
    assert _rows(trigram_search(current, p, s, _needles(spark))) == want
