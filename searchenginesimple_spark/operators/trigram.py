"""Trigram substring index + exact substring search (code-search style).

Public design: R. Cox, "Regular Expression Matching with a Trigram Index"
(2012, swtch.com/~rsc/regexp/regexp4.html) — the Google Code Search /
zoekt family.  Index every 3-char window of content; answer a substring
query by intersecting the postings of the needle's trigrams, then verify
candidates exactly against the content.  The reference engine has no
substring search — its index is token-level (``include/InvertIndex.hpp``,
jieba-token postings) — but the north-rule payload is *source code*, where
users grep for operator spellings, partial identifiers, and punctuated
patterns that token postings cannot express.  This operator is the
§2-plus code-payload extension.

Correctness contract: the last stage verifies ``instr(content, needle) > 0``
on the candidate set, so the OUTPUT equals the brute-force scan for every
needle — the trigram index only *prunes*.  That makes the DuckDB oracle the
brute-force scan itself, and it makes both scale knobs safe (each can only
widen the candidate set, never narrow the result):

* rarest-first pruning: only the ``max_trigrams`` rarest (by df) trigrams
  of a needle join the postings — intersection selectivity saturates after
  a few rare trigrams, and joining the rest only adds shuffle volume;
* hot-trigram drop (``max_df``): stop-trigrams (``"e t"``, ``" th"``, …)
  whose posting lists approach corpus size are dropped from required sets;
  a needle whose trigrams are ALL hot — or shorter than 3 chars — falls
  back to the exact broadcast-scan path instead of intersecting postings
  the size of the corpus.

Scale story (100 TB): the build is one ``transform``+``array_distinct``
projection (map-side — each doc contributes each trigram at most once
BEFORE any shuffle) and one explode; the only build shuffle is the df
aggregation over (trigram, doc_id) rows bounded by content length.  The
query side broadcasts the needle trigrams (a handful of rows per needle),
intersects via one count==n hash aggregation on (needle_id, doc_id), and
verifies by joining the candidate ids back to the doc store — a selective
join on the store's partition key, same shape as result_fetch.  No
cartesian product anywhere except the documented all-hot/short-needle
fallback, which is a broadcast of a few needles over a map-only scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def content_trigrams(col: Column) -> Column:
    """Distinct 3-char windows of ``col`` (empty array below 3 chars).

    The ``length >= 3`` guard matters: ``sequence(1, length-2)`` with
    ``length < 3`` would *descend* (Spark infers step −1 when start > stop)
    and emit junk windows.

    QUERY-SIDE ONLY (needles are tens of chars): ``substring(col, i, 3)``
    re-scans the string from byte 0 to find char offset i on every call
    (UTF8String stores variable-width UTF-8, so char→byte offset is a
    linear walk), making this expression O(len²) per value.  The BUILD
    uses the staged char-array form in build_trigram_index — identical
    output (pinned incl. CJK/emoji in tests), linear cost.
    """
    windows = F.transform(
        F.sequence(F.lit(1), F.length(col) - 2),
        lambda i: F.substring(col, i, F.lit(3)),
    )
    return F.when(F.length(col) >= 3, F.array_distinct(windows)).otherwise(
        F.array().cast("array<string>")
    )


def py_trigrams(s: str) -> set[str]:
    """Driver-side twin of ``content_trigrams`` (needle compilation only).

    Python slicing is per code point, exactly Spark's ``substring``
    character semantics (incl. astral chars — both treat a surrogate pair
    as ONE character), so the sets are equal for any string; pinned
    against the JVM expression on CJK/emoji/combining-mark needles in
    tests/test_trigram.py.  Case folding is NOT done here — callers fold
    before calling, and the ASCII-only guard in trigram_search keeps
    Python/JVM ``lower`` divergence (locale-special code points) off this
    path.  Same rule as operators/boolquery.py's ``_trigrams``."""
    return {s[i : i + 3] for i in range(len(s) - 2)}


def _trigram_postings_jvm(
    docs: DataFrame, content_col: str, case_insensitive: bool
) -> DataFrame:
    """All-JVM trigram projection (the pre-r6 build path, kept as the
    selectable twin): staged two-projection form — project the char ARRAY
    once per doc (``split(content, '')``), then window over it with O(1)
    ``element_at`` — O(len) per doc.  The naive ``substring(content, i,
    3)`` window is O(len²) per doc (UTF8String char offsets are a linear
    byte walk from 0), which MEASURED as ~100 s of the 143 s/100k-doc
    build at the r4 bench point.  The staging ``withColumn`` is
    load-bearing: inlining the split into the lambda re-evaluates it per
    element_at (Catalyst does not CSE across lambda boundaries) and is
    O(len²) again.  CollapseProject keeps the two projections separate
    because the char-array alias is referenced more than once and split
    is not cheap."""
    c = F.lower(F.col(content_col)) if case_insensitive else F.col(content_col)
    staged = docs.withColumn("_tri_ch", F.split(c, ""))
    ch = F.col("_tri_ch")
    windows = F.transform(
        F.sequence(F.lit(1), F.size(ch) - 2),
        lambda i: F.concat(
            F.element_at(ch, i), F.element_at(ch, i + 1), F.element_at(ch, i + 2)
        ),
    )
    tris = F.when(F.size(ch) >= 3, F.array_distinct(windows)).otherwise(
        F.array().cast("array<string>")
    )
    return staged.select("doc_id", F.explode(tris).alias("trigram"))


def _doc_trigrams_ascii(content: str):
    """Distinct 3-byte windows of an ASCII string, fully vectorized:
    (count, packed 3-bytes-per-trigram buffer), lexicographically sorted.
    For ASCII, byte trigrams ≡ char trigrams, and the uint32 pack order
    equals byte-lexicographic order."""
    import numpy as np

    a = np.frombuffer(content.encode("ascii"), dtype=np.uint8)
    w = np.lib.stride_tricks.sliding_window_view(a, 3)
    packed = (
        (w[:, 0].astype(np.uint32) << 16)
        | (w[:, 1].astype(np.uint32) << 8)
        | w[:, 2].astype(np.uint32)
    )
    u = np.unique(packed)
    buf = np.empty((u.size, 3), dtype=np.uint8)
    buf[:, 0] = u >> 16
    buf[:, 1] = (u >> 8) & 0xFF
    buf[:, 2] = u & 0xFF
    return u.size, buf.tobytes()


def _trigram_postings_arrow(
    docs: DataFrame, content_col: str, case_insensitive: bool
) -> DataFrame:
    """Arrow-native trigram projection (r6 default): ``mapInArrow`` hands
    whole content batches to numpy, which computes each document's
    DISTINCT 3-char windows with sliding-window views + ``np.unique`` and
    materializes the output string column directly from its packed byte
    buffer (``pa.StringArray.from_buffers`` — one offsets array over one
    data buffer, zero per-trigram Python).  Guide §4.2's "vectorized
    native code inside mapInArrow" shape.

    Rationale (measured r6, 100k docs / 39M postings): the JVM HOF window
    allocates one UTF8String per window via interpreted lambda evals —
    ~250M windows → ~25 s per execution, and write_trigram_index executes
    the projection twice (range sampler + shuffle).  The numpy path does
    the same work in ~2-4 s; the Arrow transfer ships only (doc_id,
    folded content) in and the exploded pairs out.

    Exactness: ASCII documents (the overwhelming case for code payloads)
    take the byte-window path — for ASCII, byte trigrams ≡ codepoint
    trigrams.  Non-ASCII documents fall back to per-doc Python codepoint
    slicing, which matches the JVM ``split(content, '')`` codepoint
    semantics (incl. CJK and surrogate pairs — equality pinned in
    tests/test_trigram.py against content_trigrams on exactly such
    content).  Case folding stays in the JVM (``F.lower`` BEFORE the
    Arrow hop), so ci-index keys are byte-identical to the JVM twin's.
    """
    import numpy as np
    import pyarrow as pa

    c = F.lower(F.col(content_col)) if case_insensitive else F.col(content_col)
    src = docs.select(F.col("doc_id").cast("long").alias("doc_id"), c.alias("__c"))

    def gen(batches):
        for b in batches:
            doc_ids = b.column(0).to_pylist()
            contents = b.column(1).to_pylist()
            out_ids: list = []
            bufs: list = []
            total = 0
            py_ids: list = []
            py_tris: list = []
            for did, cval in zip(doc_ids, contents):
                if cval is None or len(cval) < 3:
                    continue
                if cval.isascii():
                    n, byts = _doc_trigrams_ascii(cval)
                    out_ids.append(np.full(n, did, dtype=np.int64))
                    bufs.append(byts)
                    total += n
                else:  # exact codepoint fallback (rare for code corpora)
                    tris = list({cval[j : j + 3] for j in range(len(cval) - 2)})
                    py_ids.extend([did] * len(tris))
                    py_tris.extend(tris)
            if total:
                offs = np.arange(total + 1, dtype=np.int32) * 3
                tri_arr = pa.StringArray.from_buffers(
                    total, pa.py_buffer(offs.tobytes()), pa.py_buffer(b"".join(bufs))
                )
                id_arr = pa.array(np.concatenate(out_ids), type=pa.int64())
                yield pa.RecordBatch.from_arrays(
                    [id_arr, tri_arr], ["doc_id", "trigram"]
                )
            if py_tris:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(py_ids, type=pa.int64()),
                        pa.array(py_tris, type=pa.string()),
                    ],
                    ["doc_id", "trigram"],
                )

    return src.mapInArrow(gen, "doc_id long, trigram string")


def build_trigram_index(
    docs: DataFrame,
    content_col: str = "content",
    case_insensitive: bool = False,
    engine: str = "arrow",
) -> tuple[DataFrame, DataFrame]:
    """→ (postings(trigram, doc_id) — unique pairs, stats(trigram, df)).

    Per-doc distinctness runs inside the projection (numpy ``unique`` /
    ``array_distinct``), so the output already holds unique (trigram,
    doc_id) pairs with NO distinct shuffle; the only shuffle is the df
    hash-agg (map-side partial count first).

    ``engine`` selects the projection implementation — identical output
    (pinned in tests incl. CJK/surrogate-pair content):

    * ``"arrow"`` (default, r6) — numpy sliding-window + ``np.unique``
      inside ``mapInArrow`` (_trigram_postings_arrow); measured ~6-10×
      faster than the JVM window at the 100k bench point.
    * ``"jvm"`` — the staged char-array HOF form (_trigram_postings_jvm),
      zero Python workers; the twin for environments where the Python
      boundary is the scarce resource.

    ``case_insensitive`` indexes trigrams of ``lower(content)`` — the
    case-folded index code search defaults to (zoekt folds case and keeps
    case bits; this build keeps two indexes instead — simpler, and the
    fold shrinks the trigram universe so the ci index is never larger).
    Search with the SAME flag: a ci query against a cs index (or vice
    versa) silently misses — the flag pairs are pinned in tests.
    """
    if engine not in ("arrow", "jvm"):
        raise ValueError(f"unknown trigram engine {engine!r}")
    fn = _trigram_postings_arrow if engine == "arrow" else _trigram_postings_jvm
    postings = fn(docs, content_col, case_insensitive)
    stats = postings.groupBy("trigram").agg(F.count("*").cast("long").alias("df"))
    return postings, stats


def write_trigram_index(
    postings: DataFrame,
    path: str,
    partitions: int | None = None,
    resume: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Materialize the index CLUSTERED BY trigram and return the readers.

    Layout matters more than the filter: postings come off the build
    doc-major, so every Parquet row group spans the whole trigram range and
    the needle IN-filter prunes nothing.  One range-repartition + in-
    partition sort makes each trigram's rows contiguous — row-group min/max
    stats then confine a needle's scan to its own slice (and usually its
    own files).  This is the trigram analogue of the BM25 postings' sorted
    shard runs (operators/postings.py), and the one extra shuffle it costs
    the build is the classic build-once/query-forever trade.  (Hash
    clustering is NOT the cheap alternative — hash scatters every file
    across the full trigram range, so file/row-group min-max stats prune
    nothing; measured: queries got SLOWER than the doc-major layout.)

    Single-phase write: the un-materialized explode feeds
    ``repartitionByRange`` directly, so the trigram projection executes
    twice — once in the range-partitioner's boundary-SAMPLING job, once
    for the real shuffle write.  That is the cheaper side of a measured
    trade-off that FLIPPED in r5: with the O(len²)-per-doc substring
    windowing the build used through r4, re-running the explode doubled
    the build (212 s vs ~120 s at the 100k bench point) and a doc-major
    parquet staging phase paid for itself; with the staged char-array
    generation (build_trigram_index — ~10-30 s for the same corpus), two
    cheap explodes beat one explode plus a full extra write+read of the
    index-sized doc-major copy (measured r5: ~20-40 s single-phase vs
    ~75-130 s two-phase on the same input).  At 10^12 files the same
    arithmetic holds harder: postings are the LARGEST dataset in the
    system, and the staging phase wrote and re-read all of them.

    The df stats aggregate from the materialized clustered postings (one
    re-read of compact parquet) and land beside them.

    ``resume=True`` makes the write a checkpointed pipeline (the build-plan
    discipline, plans/build.py): each phase is skipped iff its output
    carries the ``_SUCCESS`` job-commit marker — a completed index is a
    no-op re-run, and a run that crashed after the postings commit resumes
    at the stats/metrics phases without re-shuffling.  Off by default: an
    in-memory one-shot build (tests, bench) should not trust whatever a
    previous experiment left at ``path``.
    """
    spark = postings.sparkSession

    def _committed(sub: str) -> bool:
        if not resume:
            return False
        fs, p, _ = _fs(spark, f"{path}/{sub}/_SUCCESS")
        return bool(fs.exists(p))

    if not _committed("postings"):
        p = postings.repartitionByRange(
            *([partitions] if partitions else []), F.col("trigram")
        ).sortWithinPartitions("trigram", "doc_id")
        p.write.mode("overwrite").parquet(f"{path}/postings")
    p_read = spark.read.parquet(f"{path}/postings")
    if not _committed("stats"):
        stats = p_read.groupBy("trigram").agg(
            F.count("*").cast("long").alias("df")
        )
        stats.write.mode("overwrite").parquet(f"{path}/stats")
    if not _committed("metrics"):
        write_trigram_metrics(spark, path)
    return p_read, spark.read.parquet(f"{path}/stats")


def write_trigram_metrics(spark, path: str) -> DataFrame:
    """Per-partition build lineage for the clustered index →
    ``{path}/metrics``: one row per output file with posting/doc/trigram
    counts and the file's trigram range.  The same per-partition
    docs/postings discipline the term-index build persists
    (plans/build.py metrics table, north-rule requirement) — and the
    min/max columns turn the range-clustering claim into inspectable
    data: a correctly clustered index has (near-)disjoint per-file
    trigram ranges, which is exactly what lets row-group pruning confine
    a needle's scan (tests assert this instead of trusting timings).

    The two exact distinct counts run as SEPARATE pre-distinct
    aggregations joined back on file, NOT as two countDistincts in one
    agg: multiple distinct aggregates make Catalyst Expand every input
    row once per distinct column (3× the index through the shuffle —
    measured 54-58 s of a ~80 s 100k-doc build, the whole-build
    bottleneck after the r5 windowing fix), while each pre-distinct
    collapses map-side — (file, trigram) is contiguous in the clustered
    layout, (file, doc_id) is bounded by docs-per-file — and measured
    2-4 s on the same input.  Metrics rows stay one-per-file either way.
    """
    m = _metrics_frame(spark.read.parquet(f"{path}/postings"))
    m.write.mode("overwrite").parquet(f"{path}/metrics")
    return spark.read.parquet(f"{path}/metrics")


def _metrics_frame(postings: DataFrame) -> DataFrame:
    """The metrics aggregation plan (split out so tests can pin its shape
    — specifically the absence of an Expand node, see the caller).

    Two passes over the index, not three (r6): the per-(file, trigram)
    pre-distinct carries a row count, so the plain per-file totals
    (n_postings, min/max trigram) fold into the SAME aggregation chain as
    n_trigrams instead of a third full scan; only the (file, doc_id)
    distinct stays separate.  Still Expand-free — each distinct is its own
    map-side-collapsing aggregation, never two countDistincts in one agg."""
    base = postings.select(
        F.input_file_name().alias("file"), "doc_id", "trigram"
    )
    per_tri = base.groupBy("file", "trigram").agg(
        F.count("*").cast("long").alias("c")
    )
    m1 = per_tri.groupBy("file").agg(
        F.sum("c").cast("long").alias("n_postings"),
        F.count("*").cast("long").alias("n_trigrams"),
        F.min("trigram").alias("min_trigram"),
        F.max("trigram").alias("max_trigram"),
    )
    nd = (
        base.select("file", "doc_id")
        .distinct()
        .groupBy("file")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    return m1.join(nd, "file").select(
        "file", "n_postings", "n_docs", "n_trigrams", "min_trigram",
        "max_trigram",
    )


def _fs(spark, path: str):
    """Hadoop FileSystem for ``path`` (storage-agnostic listing/delete —
    works for file://, hdfs://, s3a:// alike)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jpath, jvm


def append_trigram_delta(
    delta_docs: DataFrame,
    path: str,
    name: str,
    content_col: str = "content",
    case_insensitive: bool = False,
) -> None:
    """LSM-style incremental maintenance: index ONLY the new/changed docs
    into ``{path}/deltas/{name}`` and leave the base untouched.

    Soundness leans on the exact-verify stage (the same property that makes
    the knobs safe): a replaced document's STALE base postings can only add
    candidates, which ``instr`` verification prunes; a deleted document's
    candidates die at the docstore join.  So correctness needs exactly one
    invariant — every CURRENT document's postings exist somewhere in
    base ∪ deltas — which appending the delta provides.  No tombstones
    needed HERE (the term index, whose postings are consulted without a
    content join, carries them instead — plans/delete.py).
    (The term-index analogue is plans/merge.py, where exact-dup skip plays
    the same role; zoekt ships the same shard-append + periodic-compact
    design.)

    Cost of deferring compaction: df stats drift high for trigrams of
    replaced docs (they order rarest-first pruning only — never results)
    and stale rows widen the scan until ``compact_trigram_index`` runs.
    """
    postings, _ = build_trigram_index(delta_docs, content_col, case_insensitive)
    d = f"{path}/deltas/{name}"
    # deltas are small by nature (a day's changed files): one sorted write,
    # no two-phase staging — range-sampling a small delta is cheap.
    postings.sortWithinPartitions("trigram", "doc_id").write.mode(
        "overwrite"
    ).parquet(f"{d}/postings")
    staged = delta_docs.sparkSession.read.parquet(f"{d}/postings")
    staged.groupBy("trigram").agg(
        F.count("*").cast("long").alias("df")
    ).write.mode("overwrite").parquet(f"{d}/stats")


def _recover_crashed_swap(spark, path: str, heal_only: bool = False) -> None:
    """Finish (or discard) a compact swap that crashed mid-commit.

    compact_trigram_index commits via delete-old → rename-new; a crash
    between the two leaves ``postings_compacted/_SUCCESS`` with no
    ``postings`` dir.  Called from BOTH the compact entry point and the
    read path (read_trigram_index), so a crashed swap heals on the next
    READ — queries never wait for someone to re-run compaction.  A
    ``postings_compacted`` without ``_SUCCESS`` is a crashed partial write
    and is discarded (the deltas are still present, so re-compacting is
    exact).  Rename failures raise — a silently failed rename would leave
    the no-postings state with no error at the point of failure.

    ``heal_only=True`` (the READ path): only repair the state that actually
    blocks reads — postings missing with a committed ``postings_compacted``
    → finish the rename.  Every other leftover (an uncommitted partial
    write, or a committed one while ``postings`` still exists) may belong
    to a LIVE concurrent compaction, whose output a reader must never
    delete; those discards are the compact entry point's job, where the
    single-compaction-writer discipline makes them safe."""
    fs, cmp_path, jvm = _fs(spark, f"{path}/postings_compacted")
    if not fs.exists(cmp_path):
        return
    post_path = jvm.org.apache.hadoop.fs.Path(f"{path}/postings")
    ok = jvm.org.apache.hadoop.fs.Path(f"{path}/postings_compacted/_SUCCESS")
    if fs.exists(ok) and not fs.exists(post_path):
        if not fs.rename(cmp_path, post_path):
            raise IOError(
                f"could not finish crashed compact swap: rename "
                f"{path}/postings_compacted -> {path}/postings failed"
            )
    elif not heal_only:
        fs.delete(cmp_path, True)


def read_trigram_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """→ (postings, stats) over base ∪ all deltas.

    The count==n intersection in trigram_search counts rows per
    (needle_id, doc_id), so a (trigram, doc_id) pair indexed in BOTH base
    and a delta (replaced doc, unchanged trigram) would double-count and
    could produce nhit ≠ n_req.  The unique-pair invariant is restored by
    the SUPERSEDE rule, at base-scan cost ZERO extra shuffle: base rows
    for doc_ids present in any delta are dropped by a broadcast anti-join
    (the delta doc-id set is small by nature — recently changed files;
    when it stops being small, that is the compaction signal), and only
    the small delta union is distinct-ed (a doc replaced twice sits in
    two deltas).  A whole-index ``.distinct()`` here would shuffle every
    posting of a 10¹²-file index on every read.  Stats are the per-shard
    sums (approximate while deltas are open: superseded base rows inflate
    df; ordering/pruning-only, never results — see append_trigram_delta).

    Concurrency note: a plan from this function is a point-in-time view —
    a CONCURRENT compact_trigram_index deletes the delta dirs this plan's
    lazy scans reference, and (unlike the tombstones reader) skipping a
    vanished delta file is NOT safe here: this plan's base predates the
    compact, so the delta rows are the only copy of the replaced docs'
    postings and dropping them would lose matches.  Serving therefore
    follows the Lucene searcher-reopen discipline the delete plan
    documents: evaluate (or re-open) after a compact, single
    compaction-writer per index root.
    """
    # heal on READ, not just on compact — but read-safe: only the rename
    # that unblocks reads; discards stay with the compact entry point so a
    # reader can never destroy a live compaction's output
    _recover_crashed_swap(spark, path, heal_only=True)
    fs, dbase, _ = _fs(spark, f"{path}/deltas")
    base = spark.read.parquet(f"{path}/postings")
    stat_shards = [f"{path}/stats"]
    delta_shards = []
    if fs.exists(dbase):
        for st in fs.listStatus(dbase):
            if st.isDirectory():
                d = st.getPath().toString()
                delta_shards.append(f"{d}/postings")
                stat_shards.append(f"{d}/stats")
    if delta_shards:
        delta = spark.read.parquet(*delta_shards).distinct()
        delta_ids = delta.select("doc_id").distinct()
        postings = base.join(
            F.broadcast(delta_ids), "doc_id", "left_anti"
        ).unionByName(delta)
    else:
        postings = base
    stats = (
        spark.read.parquet(*stat_shards)
        .groupBy("trigram")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    return postings, stats


def compact_trigram_index(
    spark, path: str, partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Fold all deltas into the base: delta rows SUPERSEDE base rows for the
    same doc_id (anti-join — removes replaced docs' stale postings), then
    re-cluster by trigram and recompute exact df stats.  Clears the deltas.

    Incremental by construction: reads only materialized parquet (never
    re-explodes content), so its cost is proportional to index size, not
    corpus tokenization — the LSM compaction trade.
    """
    _recover_crashed_swap(spark, path)
    fs, dbase, _ = _fs(spark, f"{path}/deltas")
    if not fs.exists(dbase):
        return (
            spark.read.parquet(f"{path}/postings"),
            spark.read.parquet(f"{path}/stats"),
        )
    delta_dirs = [
        st.getPath().toString() for st in fs.listStatus(dbase) if st.isDirectory()
    ]
    delta = spark.read.parquet(*[f"{d}/postings" for d in delta_dirs]).distinct()
    base_p = spark.read.parquet(f"{path}/postings")
    delta_ids = delta.select("doc_id").distinct()
    merged = base_p.join(delta_ids, "doc_id", "left_anti").unionByName(delta)

    # single-phase, same r5 trade as write_trigram_index: the range
    # sampler re-executes the merge (parquet re-read + broadcast anti-join
    # + small-delta distinct — all cheap), which beats writing and
    # re-reading an index-sized staging copy.  The output lands in a fresh
    # dir swapped in AFTER commit — range sampling reads {path}/postings,
    # so writing over it in place would have the sampler race its own
    # overwrite.
    p = merged.repartitionByRange(
        *([partitions] if partitions else []), F.col("trigram")
    ).sortWithinPartitions("trigram", "doc_id")
    p.write.mode("overwrite").parquet(f"{path}/postings_compacted")
    fs2, old_postings, jvm2 = _fs(spark, f"{path}/postings")
    fs2.delete(old_postings, True)
    if not fs2.rename(
        jvm2.org.apache.hadoop.fs.Path(f"{path}/postings_compacted"),
        old_postings,
    ):
        raise IOError(
            f"compact swap rename {path}/postings_compacted -> "
            f"{path}/postings failed"
        )
    p_read = spark.read.parquet(f"{path}/postings")
    p_read.groupBy("trigram").agg(
        F.count("*").cast("long").alias("df")
    ).write.mode("overwrite").parquet(f"{path}/stats")
    write_trigram_metrics(spark, path)

    fs2.delete(dbase, True)
    return p_read, spark.read.parquet(f"{path}/stats")


def trigram_search(
    docs: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    needles: DataFrame,
    max_trigrams: int = 8,
    max_df: int | None = None,
    content_col: str = "content",
    pushdown_max_needles: int = 1000,
    case_insensitive: bool = False,
) -> DataFrame:
    """Exact substring search: (needle_id, needle, doc_id, pos) rows for
    every document whose content contains the needle (pos = 1-based first
    occurrence, ``instr`` semantics).

    ``case_insensitive`` requires an index built with the same flag
    (build_trigram_index); needle trigrams and the verify both fold case,
    so output ≡ brute-force scan over ``lower(content)``/``lower(needle)``.

    ``needles``: (needle_id:long, needle:string).  Needles with at least one
    usable (not hot-dropped) trigram take the index path; the rest — under
    3 chars, or every trigram hotter than ``max_df`` — take the broadcast
    scan path.  Both paths end in the same exact verify, so output is
    independent of the knobs (pytest pins this).

    Scan pruning: a query batch is small by nature, so the needle trigram
    UNIVERSE (≤ needles × needle_len strings) is collected driver-side and
    pushed as an IN-filter into the postings scan — Parquet row groups
    whose trigram stats miss every needle trigram are never read (same
    discipline as the term-IN pushdown in operators/wand.py, where the
    plan assertion lives).  For batches over ``pushdown_max_needles`` the
    filter is skipped (the IN-list would bloat the plan) and the join
    alone drives the scan.
    """
    # Driver-compiled needle batch (r6): ONE limit-bounded collect replaces
    # the former count job + distinct-universe collect, the needle trigrams
    # come from the Python twin (py_trigrams — same rule boolean_search's
    # compiler already uses), and the needle/ntri relations are rebuilt as
    # Arrow-local frames so their broadcasts cost no Python-conversion job
    # (sources/io.py::arrow_local_df).  Guard: under ci, non-ASCII needles
    # keep the JVM path — Python str.lower and Spark lower can disagree on
    # locale-special code points, and the index keys are folded JVM-side.
    needle_rows = None
    try:
        needle_rows = needles.limit(pushdown_max_needles + 1).collect()
    except Exception:  # pragma: no cover - streaming/no-collect sources
        needle_rows = None
    compiled = (
        needle_rows is not None
        and len(needle_rows) <= pushdown_max_needles
        and (
            not case_insensitive
            or all((r["needle"] or "").isascii() for r in needle_rows)
        )
    )
    if compiled:
        from searchenginesimple_spark.sources.io import arrow_local_df

        spark = needles.sparkSession
        needles = arrow_local_df(
            spark,
            [(int(r["needle_id"]), r["needle"]) for r in needle_rows],
            "needle_id long, needle string",
        )
        tri_rows: list[tuple[int, str]] = []
        for r in needle_rows:
            s = r["needle"] or ""
            if case_insensitive:
                s = s.lower()
            tri_rows.extend(
                (int(r["needle_id"]), t) for t in sorted(py_trigrams(s))
            )
        ntri = arrow_local_df(spark, tri_rows, "needle_id long, trigram string")
        universe = sorted({t for _, t in tri_rows})
        if universe:
            postings = postings.filter(F.col("trigram").isin(universe))
            stats = stats.filter(F.col("trigram").isin(universe))
    else:
        needle_c = F.lower(F.col("needle")) if case_insensitive else F.col("needle")
        ntri = needles.select(
            "needle_id", F.explode(content_trigrams(needle_c)).alias("trigram")
        )
        n_needles = (
            len(needle_rows)
            if needle_rows is not None
            else pushdown_max_needles + 1
        )
        if n_needles <= pushdown_max_needles:
            universe = [
                r["trigram"] for r in ntri.select("trigram").distinct().collect()
            ]
            if universe:
                postings = postings.filter(F.col("trigram").isin(universe))
                stats = stats.filter(F.col("trigram").isin(universe))
    # left join: a trigram absent from the index (df null → 0) is the BEST
    # evidence — it proves the needle matches nothing, and ranking it
    # rarest-first makes the intersection empty immediately.
    req = ntri.join(stats, "trigram", "left").withColumn(
        "df", F.coalesce("df", F.lit(0).cast("long"))
    )
    if max_df is not None:
        req = req.filter(F.col("df") <= max_df)
    w = Window.partitionBy("needle_id").orderBy(F.asc("df"), F.asc("trigram"))
    req = (
        req.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= max_trigrams)
        .select("needle_id", "trigram")
    )
    n_req = req.groupBy("needle_id").agg(F.count("*").cast("int").alias("n_req"))

    # index path: postings ⋈ broadcast(required trigrams) → count==n per doc
    cand = (
        postings.join(F.broadcast(req), "trigram")
        .groupBy("needle_id", "doc_id")
        .agg(F.count("*").cast("int").alias("nhit"))
        .join(F.broadcast(n_req), "needle_id")
        .filter(F.col("nhit") == F.col("n_req"))
        .select("needle_id", "doc_id")
    )
    indexed = cand.join(F.broadcast(needles), "needle_id").join(docs, "doc_id")

    # scan path: needles with NO required trigram (short, or all hot-dropped)
    scan_needles = needles.join(F.broadcast(n_req), "needle_id", "left_anti")
    scanned = docs.join(F.broadcast(scan_needles))

    if case_insensitive:
        pos = F.instr(F.lower(F.col(content_col)), F.lower(F.col("needle")))
    else:
        pos = F.instr(F.col(content_col), F.col("needle"))
    pos = pos.cast("long")
    out_cols = ["needle_id", "needle", "doc_id"]
    return (
        indexed.select(*out_cols, pos.alias("pos"))
        .unionByName(scanned.select(*out_cols, pos.alias("pos")))
        .filter(F.col("pos") > 0)
    )


def trigram_search_topk(
    docs: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    needles: DataFrame,
    k: int = 10,
    content_col: str = "content",
    **search_kwargs,
) -> DataFrame:
    """Ranked substring search → (needle_id, needle, rank, doc_id,
    n_occurrences): the results-page form of trigram_search — top-k
    matching documents per needle, ranked by occurrence count (desc, ties
    doc_id asc).  zoekt ranks its candidates the same way before its
    symbol/file boosts; occurrence count is the boost-free core and is
    exactly SQL-expressible, so the whole ranking stays oracle-checkable:

        n_occurrences = (len(content) − len(replace(content, needle))) / len(needle)

    Scale shape: inherits trigram_search's pruning (only verified matches
    reach the scoring projection), adds one per-needle top-k window whose
    input is already candidate-sized — the same map-side WindowGroupLimit
    as every rank-filter in this engine.
    """
    hits = trigram_search(
        docs, postings, stats, needles, content_col=content_col, **search_kwargs
    )
    matched = hits.select("needle_id", "needle", "doc_id").join(
        docs.select("doc_id", content_col), "doc_id"
    )
    c, n = F.col(content_col), F.col("needle")
    if search_kwargs.get("case_insensitive"):
        c, n = F.lower(c), F.lower(n)
    occ = (
        (F.length(c) - F.length(F.replace(c, n))) / F.length(n)
    ).cast("long")
    w = Window.partitionBy("needle_id").orderBy(
        F.desc("n_occurrences"), F.asc("doc_id")
    )
    return (
        matched.withColumn("n_occurrences", occ)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "needle_id", "needle", F.col("rank").cast("int").alias("rank"),
            "doc_id", "n_occurrences",
        )
    )


def trigram_search_topk_ranked(
    docs: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    needles: DataFrame,
    k: int = 10,
    content_col: str = "content",
    path_col: str = "path",
    **search_kwargs,
) -> DataFrame:
    """zoekt-ordered results → (needle_id, needle, rank, doc_id,
    symbol_match, path_match, n_occurrences): top-k per needle ordered by
    symbol-definition match > file-path match > occurrence count (ties
    doc_id asc) — zoekt's boost ladder (a hit on a definition site
    outranks prose hits; a hit in the filename outranks body hits) over
    trigram_search_topk's boost-free core.

    ``symbol_match``: the needle occurs inside a symbol DEFINED in the doc
    (functions/code.py::extract_symbols, the ctags-style definition rows);
    ``path_match``: the needle occurs in ``path_col``.  Both are plain
    string arithmetic over driver-visible rules, so a test twin reproduces
    the full ordering independently.

    Scale shape: boosts are computed on VERIFIED MATCHES only —
    extract_symbols runs over the distinct matched docs (candidate-sized,
    never the corpus), and the symbol join is one hash join on doc_id
    whose output collapses straight back to a (needle, doc) flag; the
    final per-needle top-k is the usual map-side WindowGroupLimit.
    """
    from searchenginesimple_spark.functions.code import extract_symbols

    ci = bool(search_kwargs.get("case_insensitive"))
    hits = trigram_search(
        docs, postings, stats, needles, content_col=content_col, **search_kwargs
    )
    matched = hits.select("needle_id", "needle", "doc_id").join(
        docs.select("doc_id", content_col, path_col), "doc_id"
    )

    def fold(col: Column) -> Column:
        return F.lower(col) if ci else col

    c, n, p = fold(F.col(content_col)), fold(F.col("needle")), fold(F.col(path_col))
    occ = ((F.length(c) - F.length(F.replace(c, n))) / F.length(n)).cast("long")
    base = matched.select(
        "needle_id",
        "needle",
        "doc_id",
        (F.instr(p, n) > 0).cast("int").alias("path_match"),
        occ.alias("n_occurrences"),
    )

    mdocs = matched.select("doc_id", content_col).distinct()
    defs = extract_symbols(mdocs, content_col).select("doc_id", "symbol")
    sym = (
        matched.select("needle_id", "doc_id", "needle")
        .join(defs, "doc_id")
        .filter(F.instr(fold(F.col("symbol")), n) > 0)
        .select("needle_id", "doc_id")
        .distinct()
        .withColumn("symbol_match", F.lit(1))
    )
    ranked = base.join(sym, ["needle_id", "doc_id"], "left").withColumn(
        "symbol_match", F.coalesce("symbol_match", F.lit(0)).cast("int")
    )
    w = Window.partitionBy("needle_id").orderBy(
        F.desc("symbol_match"),
        F.desc("path_match"),
        F.desc("n_occurrences"),
        F.asc("doc_id"),
    )
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "needle_id",
            "needle",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            "symbol_match",
            "path_match",
            "n_occurrences",
        )
    )


def trigram_search_lines(
    docs: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    needles: DataFrame,
    max_lines_per_doc: int | None = None,
    content_col: str = "content",
    **search_kwargs,
) -> DataFrame:
    """grep-style result rows → (needle_id, needle, doc_id, line_no, line):
    one row per LINE containing the needle, 1-based line numbers — the
    form livegrep/zoekt return to the results page (zoekt's LineMatch).

    A needle containing ``\\n`` spans lines and so matches no single line:
    it yields doc-level hits in trigram_search but no rows here (grep
    semantics — documented, and pinned in tests).  ``max_lines_per_doc``
    caps rows per (needle, doc) in line order (``grep -m``).

    Scale shape (r6): line matching runs IN-ROW over the verified hits —
    one (hit ⋈ content) projection splits each matched doc's content into
    a staged line array, a single array filter keeps the (line, line_no)
    structs containing the needle, and ``max_lines_per_doc`` is a plain
    ``slice`` before the explode.  The former shape exploded every matched
    doc's lines to rows, joined them back to the hits, and ranked a
    per-(needle, doc) row_number window to apply the cap — a full
    shuffle+sort of every matched LINE that the array form does without
    any exchange at all (2 Exchange → 0 beyond the candidate join; the
    grep-twin equality in tests/test_trigram_lines.py pins the identical
    output, first-k-in-line-order semantics included).
    """
    ci = bool(search_kwargs.get("case_insensitive"))
    hits = trigram_search(
        docs, postings, stats, needles, content_col=content_col, **search_kwargs
    ).select("needle_id", "needle", "doc_id")

    def fold(col: Column) -> Column:
        return F.lower(col) if ci else col

    staged = hits.join(docs.select("doc_id", content_col), "doc_id").select(
        "needle_id",
        "needle",
        "doc_id",
        F.split(F.col(content_col), "\n", -1).alias("__lines"),
    )
    numbered = F.zip_with(
        F.col("__lines"),
        F.sequence(F.lit(1), F.size("__lines")),
        lambda l, i: F.struct(l.alias("line"), i.cast("long").alias("ln")),
    )
    ml = F.filter(
        numbered, lambda p: F.instr(fold(p["line"]), fold(F.col("needle"))) > 0
    )
    if max_lines_per_doc is not None:
        ml = F.slice(ml, 1, max_lines_per_doc)
    return staged.select(
        "needle_id", "needle", "doc_id", F.explode(ml).alias("m")
    ).select(
        "needle_id",
        "needle",
        "doc_id",
        F.col("m.ln").alias("line_no"),
        F.col("m.line").alias("line"),
    )


def trigram_search_bruteforce(
    docs: DataFrame,
    needles: DataFrame,
    content_col: str = "content",
    case_insensitive: bool = False,
) -> DataFrame:
    """The scan twin (what the oracle runs): broadcast every needle over a
    map-only pass.  Used by tests to pin index-path ≡ scan for arbitrary
    needles and knob settings."""
    if case_insensitive:
        pos = F.instr(F.lower(F.col(content_col)), F.lower(F.col("needle")))
    else:
        pos = F.instr(F.col(content_col), F.col("needle"))
    pos = pos.cast("long")
    return (
        docs.join(F.broadcast(needles))
        .select("needle_id", "needle", "doc_id", pos.alias("pos"))
        .filter(F.col("pos") > 0)
    )
