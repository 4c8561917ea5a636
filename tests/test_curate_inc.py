"""Incremental curation (plans/curate_inc.py).

Pins: cross-generation exact and near-dup suppression (base always wins),
within-delta dedup, quality on the delta, GLOBAL per-source quota,
increment ≡ full batch on an exact-dups-only corpus, the monotone-id
contract, and double-submit failing loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.plans.curate import CurateConfig, curate
from searchenginesimple_spark.plans.curate_inc import curate_increment, read_curated
from searchenginesimple_spark.sources.io import TableIO

BASE_TXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR = "red orange yellow green blue indigo violet black white brown"


def _cfg(**kw):
    return CurateConfig(
        minhash_threshold=0.5, minhash_hashes=32, minhash_bands=16, shingle_n=3, **kw
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, content string, lang string, source string"
    )


@pytest.fixture()
def base_root(spark, tmp_path):
    rows = [
        (0, BASE_TXT + " one", "en", "srcA"),
        (1, NEAR + " " + NEAR + " two", "en", "srcA"),
        (2, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es", "srcB"),
    ]
    io = TableIO(spark, str(tmp_path))
    curate(spark, _docs(spark, rows), io, _cfg())
    return io


def test_increment_stage_rules(spark, base_root):
    io = base_root
    delta = _docs(
        spark,
        [
            # exact dup of base doc 0 → dropped (base wins)
            (10, BASE_TXT + " one", "en", "srcA"),
            # near-dup of base doc 1 (trailing token differs) → dropped
            (11, NEAR + " " + NEAR + " three", "en", "srcB"),
            # within-delta exact pair → min id 12 kept, 13 dropped
            (12, "nova luna stella orbis mundi caelum terra mare ignis aqua", "en", "srcB"),
            (13, "nova luna stella orbis mundi caelum terra mare ignis aqua", "en", "srcB"),
            # junk → quality drop
            (14, "x y", "en", "srcC"),
            # clean unique doc → admitted
            (15, "zyx wvu tsr qpo nml kji hgf edc ba z", "en", "srcC"),
        ],
    )
    admitted = curate_increment(spark, delta, io, _cfg())
    got = sorted(r["doc_id"] for r in admitted.collect())
    assert got == [12, 15]
    # the full curated corpus = base kept ∪ admitted delta
    assert sorted(r["doc_id"] for r in read_curated(io).collect()) == [0, 1, 2, 12, 15]
    gens = {r["gen"]: (r["docs_in"], r["docs_out"])
            for r in io.read("curate_generations").collect()}
    assert gens == {1: (6, 2)}

    # a second increment chains off generation 1's state: an exact dup of
    # the gen-1 admitted doc 15 now drops too
    delta2 = _docs(
        spark,
        [
            (20, "zyx wvu tsr qpo nml kji hgf edc ba z", "en", "srcC"),
            (21, "omega psi chi phi upsilon tau sigma rho pi omicron", "en", "srcC"),
        ],
    )
    admitted2 = curate_increment(spark, delta2, io, _cfg())
    assert [r["doc_id"] for r in admitted2.collect()] == [21]
    assert sorted(r["doc_id"] for r in read_curated(io).collect()) == [
        0, 1, 2, 12, 15, 21,
    ]


def test_increment_equals_batch_on_exact_dups(spark, tmp_path):
    """For exact-dup-only corpora the incremental and the batch pipeline
    provably agree (the merge.py argument): same kept id set."""
    base_rows = [
        (0, "one two three four five six seven eight nine ten", "en", "s"),
        (1, "ichi ni san shi go roku nana hachi kyu ju", "en", "s"),
    ]
    delta_rows = [
        (10, "one two three four five six seven eight nine ten", "en", "s"),
        (11, "uno due tre quattro cinque sei sette otto nove dieci", "en", "s"),
    ]
    io_full = TableIO(spark, str(tmp_path / "full"))
    curate(spark, _docs(spark, base_rows + delta_rows), io_full, _cfg())
    full_ids = sorted(
        r["doc_id"] for r in io_full.read("curate_kept").collect()
    )

    io_inc = TableIO(spark, str(tmp_path / "inc"))
    curate(spark, _docs(spark, base_rows), io_inc, _cfg())
    curate_increment(spark, _docs(spark, delta_rows), io_inc, _cfg())
    inc_ids = sorted(r["doc_id"] for r in read_curated(io_inc).collect())
    assert inc_ids == full_ids == [0, 1, 11]


def test_global_source_quota(spark, tmp_path):
    cfg = _cfg(per_source_cap=3)
    base_rows = [
        (i, f"base doc {i} " + " ".join(f"b{i}_{j}" for j in range(9)), "en", "srcQ")
        for i in range(2)
    ]
    io = TableIO(spark, str(tmp_path))
    curate(spark, _docs(spark, base_rows), io, cfg)
    assert io.read("curate_kept").count() == 2

    delta_rows = [
        (10 + i, f"delta doc {i} " + " ".join(f"d{i}_{j}" for j in range(9)), "en", "srcQ")
        for i in range(4)
    ]
    admitted = curate_increment(spark, _docs(spark, delta_rows), io, cfg)
    # srcQ already holds 2 of cap 3 → exactly ONE delta doc admitted, the
    # smallest id
    assert [r["doc_id"] for r in admitted.collect()] == [10]


def test_id_contract_and_double_submit(spark, base_root):
    io = base_root
    bad = _docs(spark, [(1, "whatever tokens here for the contract", "en", "s")])
    with pytest.raises(ValueError, match="doc_ids must exceed"):
        curate_increment(spark, bad, io, _cfg())

    delta = _docs(
        spark, [(30, "fresh unique tokens never seen before at all", "en", "s")]
    )
    assert [r["doc_id"] for r in curate_increment(spark, delta, io, _cfg()).collect()] == [30]
    # resubmitting the same delta violates the monotone-id contract loudly
    # (its ids are now part of the base)
    with pytest.raises(ValueError, match="doc_ids must exceed"):
        curate_increment(spark, delta, io, _cfg())


def test_id_contract_covers_dropped_delta_ids(spark, base_root):
    """The monotone-id check validates against every id a prior increment
    SAW, not just the ones it kept: a new delta reusing an id that a prior
    generation dropped (quality) fails loudly."""
    io = base_root
    delta = _docs(
        spark,
        [
            (40, "fresh unique tokens never seen before at all", "en", "s"),
            (45, "x y", "en", "s"),  # quality-dropped, but SEEN
        ],
    )
    kept = curate_increment(spark, delta, io, _cfg())
    assert [r["doc_id"] for r in kept.collect()] == [40]
    clash = _docs(
        spark,
        [(42, "totally different clean content words arriving here now", "en", "s")],
    )
    with pytest.raises(ValueError, match="previously\\s+seen"):
        curate_increment(spark, clash, io, _cfg())
    # beyond the true seen max (45) is fine even though kept max is 40
    ok = _docs(
        spark,
        [(46, "yet another clean unique document with plenty words", "en", "s")],
    )
    assert [r["doc_id"] for r in curate_increment(spark, ok, io, _cfg()).collect()] == [46]


def test_kept_gen_schema_reconciled_across_generations(spark, tmp_path):
    """Partitioned parquet cannot carry per-generation schemas (readers
    sample one footer; no mergeSchema): a delta MISSING a base column is
    committed with that column null-filled, and a delta carrying an EXTRA
    column fails loudly instead of silently forking the table schema."""
    rows = [
        (0, BASE_TXT + " one", "en", "srcA", "src/f0.py"),
        (1, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es",
         "srcB", "src/f1.py"),
    ]
    base = spark.createDataFrame(
        rows, "doc_id long, content string, lang string, source string, path string"
    )
    io = TableIO(spark, str(tmp_path))
    curate(spark, base, io, _cfg())

    delta = _docs(  # no 'path' column
        spark,
        [(10, "fresh unique tokens never seen before at all", "en", "srcA")],
    )
    kept = curate_increment(spark, delta, io, _cfg())
    assert "path" in kept.columns
    full = read_curated(io)
    assert set(full.columns) == {"doc_id", "content", "lang", "source", "path"}
    by_id = {r["doc_id"]: r["path"] for r in full.collect()}
    assert by_id[0] == "src/f0.py" and by_id[10] is None

    extra = spark.createDataFrame(
        [(20, "clean unique words arriving here right now ok", "en", "srcA",
          "branch-x")],
        "doc_id long, content string, lang string, source string, branch string",
    )
    with pytest.raises(ValueError, match="do not exist in"):
        curate_increment(spark, extra, io, _cfg())
