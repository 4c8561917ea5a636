"""Repo-level context packing: whole-repository training samples.

The repo-context twin of per-document chunking (operators/chunk.py): code
models are trained on samples that keep a repository's files TOGETHER so
cross-file structure (imports, call sites, headers) survives into the
context window — the packing stage public code pipelines run after
curation (StarCoder's <reponame>/<filename> concatenation is the best
known public precedent).  The rule here:

    within each repo, files are ordered by (path, doc_id) and packed
    greedily: a file whose tokens no longer fit starts the next sample —
    every sample is <= ``sample_tokens`` unless a SINGLE file alone
    exceeds the budget (that file becomes its own over-budget sample,
    never split; split it with chunk_documents downstream if needed).
    Each file is prepended a one-line header ``<header_prefix><path>`` so
    file boundaries survive concatenation.

Spark-first shape — two phases so content never rides the sequential part:

1. ASSIGNMENT over metadata only: per-file token counts are a map-side
   projection; one shuffle groups (path, doc_id, n_tokens) structs per
   repo (~tens of bytes per file — a 10^5-file repo is a ~10 MB row;
   repos beyond that should be pre-split upstream, the same honesty note
   as chunk.py's O(lines^2) fold), the greedy fold (chunk.py's
   ``_greedy_bins``, same Catalyst ``F.aggregate``) assigns each file its
   sample id, and arrays_zip+explode emits (doc_id -> sample_id).
2. ASSEMBLY: the assignment joins back to the content table on doc_id (a
   plain shuffle join; content moves exactly once) and one groupBy
   (repo, sample_id) collects each sample's files — bounded by the token
   budget by construction, so the collected row can never blow up on a
   giant repo.

Zero Python rows anywhere; deterministic, so the pure-Python twin in
tests reproduces it byte-for-byte.  ``n_tokens`` counts file CONTENT
tokens (headers excluded) — the greedy rule and the reported size use the
same number.

The reference engine has no equivalent (it serves search results, not
training samples); this operator, chunk_documents, and plans/curate.py
form the curation -> training seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchenginesimple_spark.config import TOKEN_RE
from searchenginesimple_spark.operators.chunk import _greedy_bins


def pack_repo_samples(
    docs: DataFrame,
    sample_tokens: int = 8192,
    content_col: str = "content",
    repo_col: str = "repo",
    path_col: str = "path",
    header_prefix: str = "### ",
    token_re: str = TOKEN_RE,
) -> DataFrame:
    """-> (repo, sample_id, n_files, n_tokens, sample): greedy path-ordered
    repo packing, sample_id 0-based per repo.

    ``sample`` is the newline-joined ``header + "\\n" + content`` blocks of
    the sample's files in (path, doc_id) order; ``n_tokens`` is the sum of
    the files' content token counts (the number the greedy rule packed by).
    A repo with no files yields nothing; a file with empty content still
    occupies a slot (0 tokens).
    """
    if sample_tokens < 1:
        raise ValueError("sample_tokens must be >= 1")

    # NULL keys fold to empty strings up front: a null repo would silently
    # drop its files at the phase-2 inner equi-join (NULL != NULL), and a
    # null path would null the concat'd block — both are data loss, not
    # errors, so they must not depend on the input's nullability
    counted = docs.select(
        F.coalesce(F.col(repo_col), F.lit("")).alias("repo"),
        F.coalesce(F.col(path_col), F.lit("")).alias("path"),
        "doc_id",
        F.coalesce(F.col(content_col), F.lit("")).alias("_content"),
    ).withColumn(
        "n_tokens",
        F.size(
            F.regexp_extract_all(F.lower(F.col("_content")), F.lit(token_re), F.lit(0))
        ).cast("long"),
    )

    # phase 1: metadata-only greedy assignment (struct sort = (path, doc_id)
    # lexicographic — the deterministic file order)
    per_repo = (
        counted.select("repo", "path", "doc_id", "n_tokens")
        .groupBy("repo")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("path", "doc_id", "n_tokens"))
            ).alias("_files")
        )
    )
    bins = _greedy_bins(
        F.transform(F.col("_files"), lambda x: x["n_tokens"]), sample_tokens
    )
    assign = (
        per_repo.select(
            "repo",
            F.explode(F.arrays_zip(F.col("_files"), bins.alias("_bin"))).alias("z"),
        )
        .select(
            "repo",
            F.col("z._files.doc_id").alias("doc_id"),
            F.col("z._bin").alias("sample_id"),
        )
    )

    # phase 2: content joins in once; each (repo, sample_id) group is
    # budget-bounded by construction
    blocks = counted.join(assign, ["repo", "doc_id"]).select(
        "repo",
        "sample_id",
        F.struct(
            "path",
            "doc_id",
            F.concat(
                F.lit(header_prefix), F.col("path"), F.lit("\n"), F.col("_content")
            ).alias("block"),
            "n_tokens",
        ).alias("f"),
    )
    return (
        blocks.groupBy("repo", "sample_id")
        .agg(F.sort_array(F.collect_list("f")).alias("_fs"))
        .select(
            "repo",
            "sample_id",
            F.size("_fs").alias("n_files"),
            F.aggregate(
                F.transform(F.col("_fs"), lambda x: x["n_tokens"]),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).alias("n_tokens"),
            F.array_join(
                F.transform(F.col("_fs"), lambda x: x["block"]), "\n"
            ).alias("sample"),
        )
    )


def pack_repo_samples_py(
    rows: list[tuple[str, str, int, str]],
    sample_tokens: int = 8192,
    header_prefix: str = "### ",
    token_re: str = TOKEN_RE,
) -> list[tuple[str, int, int, int, str]]:
    """Pure-Python twin (the test oracle): identical greedy rule over
    (repo, path, doc_id, content) rows -> sorted
    (repo, sample_id, n_files, n_tokens, sample) rows."""
    import re
    from collections import defaultdict

    by_repo: dict[str, list[tuple[str, int, str]]] = defaultdict(list)
    for repo, path, doc_id, content in rows:
        # None keys fold to "" — the operator's null rule
        by_repo[repo or ""].append((path or "", doc_id, content or ""))
    out = []
    for repo, files in by_repo.items():
        files.sort()
        samples: dict[int, list[tuple[str, int, str, int]]] = defaultdict(list)
        b, fill = 0, 0
        for path, doc_id, content in files:
            x = len(re.findall(token_re, content.lower()))
            if fill + x > sample_tokens and fill > 0:
                b, fill = b + 1, x
            else:
                fill += x
            samples[b].append((path, doc_id, content, x))
        for sid, fs in samples.items():
            out.append(
                (
                    repo,
                    sid,
                    len(fs),
                    sum(x for _, _, _, x in fs),
                    "\n".join(
                        f"{header_prefix}{p}\n{c}" for p, _, c, _ in fs
                    ),
                )
            )
    return sorted(out)
