"""Document chunking: context-window-sized training samples from documents.

The step between curation (plans/curate.py) and training: an LLM data
pipeline consumes documents as chunks bounded by a token budget, aligned
to natural boundaries, with overlap so no span is only ever seen cut in
half.  For code, the natural boundary is the LINE (splitting mid-line
destroys syntax); the packing rule here is the standard greedy one:

    walk lines in order; a line whose tokens no longer fit starts the next
    chunk — so every chunk is ≤ ``chunk_tokens`` unless a SINGLE line
    alone exceeds the budget (that line becomes its own over-budget chunk,
    never split).  ``overlap_lines`` trailing lines of chunk k are
    prepended to chunk k+1.

Spark-first shape: the whole computation is ONE map-side projection of
array HOFs — split to lines, per-line token counts, a greedy
``F.aggregate`` fold assigning each line its chunk id, chunk-boundary
arithmetic, then a single ``posexplode`` of the assembled chunks.  Zero
shuffles, zero Python; deterministic, so the pure-Python twin in tests
reproduces it byte-for-byte.  (The fold appends to an array per line —
Catalyst copies the accumulator, so cost is O(lines²) array copies per
document in the worst case; fine for source files, and honest: a corpus
of million-line blobs should pre-split upstream.)

The reference engine has no equivalent (it serves search results, not
training samples); the public precedent is every LLM data pipeline's
fixed-context packing stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from searchenginesimple_spark.config import TOKEN_RE


def _line_token_counts(lines: Column, token_re: str) -> Column:
    return F.transform(
        lines,
        lambda l: F.size(
            F.regexp_extract_all(F.lower(l), F.lit(token_re), F.lit(0))
        ).cast("long"),
    )


def _greedy_bins(tc: Column, budget: int) -> Column:
    """Greedy line→chunk assignment: bins[i] = chunk id of line i."""
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        zero.alias("bin"),
        zero.alias("fill"),
        F.array().cast("array<bigint>").alias("bins"),
    )

    def step(acc, x):
        roll = (acc["fill"] + x > F.lit(budget)) & (acc["fill"] > 0)
        nbin = F.when(roll, acc["bin"] + 1).otherwise(acc["bin"])
        return F.struct(
            nbin.alias("bin"),
            F.when(roll, x).otherwise(acc["fill"] + x).alias("fill"),
            F.concat(acc["bins"], F.array(nbin)).alias("bins"),
        )

    return F.aggregate(tc, acc0, step, lambda acc: acc["bins"])


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 512,
    overlap_lines: int = 0,
    content_col: str = "content",
    token_re: str = TOKEN_RE,
) -> DataFrame:
    """→ (doc_id, chunk_id, n_chunks, n_tokens, chunk): line-aligned greedy
    chunks per document, chunk_id 0-based in document order.

    ``n_tokens`` counts the chunk's OWN tokens including prepended overlap
    lines (the size the training consumer actually pays).  An empty
    document yields one empty chunk (chunks partition the doc: concatenating
    chunks with overlap removed reproduces content exactly — pinned in
    tests).
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if overlap_lines < 0:
        raise ValueError("overlap_lines must be >= 0")

    lines = F.split(F.col(content_col), "\n", -1)
    tc = _line_token_counts(lines, token_re)
    bins = _greedy_bins(tc, chunk_tokens)
    n_chunks = F.element_at(bins, -1) + 1

    base = docs.select(
        "doc_id",
        lines.alias("_lines"),
        tc.alias("_tc"),
        bins.alias("_bins"),
        n_chunks.alias("n_chunks"),
    )

    # starts[b] = 0-based index of the first line of chunk b; sentinel
    # starts[n_chunks] = #lines closes the last slice.  bins is sorted
    # ascending with no gaps, so array_position finds the first occurrence.
    starts = F.concat(
        F.transform(
            F.sequence(F.lit(0), F.col("n_chunks") - 1),
            lambda b: F.array_position(F.col("_bins"), b.cast("bigint")) - 1,
        ),
        F.array(F.size(F.col("_bins")).cast("bigint")),
    )
    base = base.withColumn("_starts", starts)

    def chunk_struct(b):
        s = F.element_at(F.col("_starts"), (b + 1).cast("int"))  # 1-based idx
        e = F.element_at(F.col("_starts"), (b + 2).cast("int"))
        s_ov = F.greatest(s - overlap_lines, F.lit(0).cast("bigint"))
        take = (e - s_ov).cast("int")
        sl = F.slice(F.col("_lines"), (s_ov + 1).cast("int"), take)
        tl = F.slice(F.col("_tc"), (s_ov + 1).cast("int"), take)
        return F.struct(
            b.cast("long").alias("chunk_id"),
            F.aggregate(
                tl, F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("n_tokens"),
            F.concat_ws("\n", sl).alias("chunk"),
        )

    chunks = F.transform(
        F.sequence(F.lit(0), F.col("n_chunks") - 1), chunk_struct
    )
    return base.select(
        "doc_id", "n_chunks", F.explode(chunks).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        "n_chunks",
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk").alias("chunk"),
    )


def chunk_documents_py(
    rows: list[tuple[int, str]],
    chunk_tokens: int = 512,
    overlap_lines: int = 0,
    token_re: str = TOKEN_RE,
) -> list[tuple[int, int, int, int, str]]:
    """Pure-Python twin (the test oracle): identical greedy rule."""
    import re

    out = []
    for doc_id, content in rows:
        lines = content.split("\n")
        tc = [len(re.findall(token_re, l.lower())) for l in lines]
        bins, b, fill = [], 0, 0
        for x in tc:
            if fill + x > chunk_tokens and fill > 0:
                b, fill = b + 1, x
            else:
                fill += x
            bins.append(b)
        n_chunks = bins[-1] + 1
        starts = [bins.index(k) for k in range(n_chunks)] + [len(lines)]
        for k in range(n_chunks):
            s = max(starts[k] - overlap_lines, 0)
            e = starts[k + 1]
            out.append(
                (doc_id, k, n_chunks, sum(tc[s:e]), "\n".join(lines[s:e]))
            )
    return sorted(out)
