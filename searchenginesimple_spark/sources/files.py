"""Source-tree ingest: recursive directory scan + whole-file read as ONE
distributed Spark source.

The reference walks corpus directories driver-side and slurps each file
into a string (``include/Page/Page.hpp:37-72`` DirScanner — skips
dotfiles; ``include/helper/readAll.hpp:10-15`` ReadAll).  The Spark-first
form is the ``binaryFile`` data source: file LISTING is parallelized and
catalog-driven, file CONTENT arrives as a binary column in executor
memory, and both inherit partition pruning / maxPartitionBytes sizing —
nothing is ever collected to the driver.  At 10^12 files the listing
itself is the scale problem, which is why a real deployment fronts this
with a manifest/Iceberg table (sources/io.py); this module is the
bootstrap that BUILDS such a table from a raw checkout tree.

Semantics matched to the reference + the input_hint schema
``(repo, path, commit, lang, content)``:

* dotfiles / ``_``-prefixed files are skipped (Spark file sources filter
  hidden files — the same rule DirScanner applies);
* content is decoded as UTF-8 with U+FFFD replacement for invalid bytes
  (a code corpus always contains a few latin-1 strays; failing the whole
  scan on one of them is wrong, and the replacement is deterministic so
  downstream hashes are stable);
* files over ``max_bytes`` are dropped BEFORE decode (generated bundles /
  binaries; the curation prefilter handles the subtler cases) — the cut
  happens on the source's ``length`` metadata column, so oversized blobs
  never occupy executor memory;
* ``lang`` derives from the file extension (the github-linguist shortcut
  — enough for the engine's lang facets/filters; unknown → 'unknown');
* ``path`` is repo-relative, ``repo``/``commit`` are caller-supplied
  metadata (no git binary dependency — at scale the checkout service
  knows the commit; default 'HEAD').

Measured (BASELINE.md): 20k × 1.5 KB files ingest end-to-end (scan →
decode → dense ids → parquet) in ≈6 s warm on local[16] (~3,350
files/s).  Small-file task sizing: file sources bill each file at
``spark.sql.files.openCostInBytes`` (4 MiB default), so a small-file
corpus splits into ~4-files-per-task; on a many-million-file ingest
raise that conf (or lower it for large files) to balance task count
against open latency — it is the standard knob, deliberately left at
the session level rather than mutated here.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → lang (github-linguist's common-case core; lowercase keys)
LANG_BY_EXT: dict[str, str] = {
    "py": "python", "pyi": "python",
    "js": "javascript", "jsx": "javascript", "mjs": "javascript",
    "ts": "typescript", "tsx": "typescript",
    "java": "java", "kt": "kotlin", "scala": "scala",
    "c": "c", "h": "c",
    "cc": "cpp", "cpp": "cpp", "cxx": "cpp", "hpp": "cpp", "hh": "cpp",
    "go": "go", "rs": "rust", "rb": "ruby", "php": "php",
    "cs": "csharp", "swift": "swift", "m": "objc",
    "sh": "shell", "bash": "shell",
    "sql": "sql", "r": "r", "pl": "perl", "lua": "lua",
    "html": "html", "htm": "html", "css": "css",
    "json": "json", "yaml": "yaml", "yml": "yaml", "toml": "toml",
    "xml": "xml", "md": "markdown", "rst": "rst", "txt": "text",
}

DEFAULT_MAX_BYTES = 1 << 20  # 1 MiB — same order as linguist's size cutoffs


def lang_from_path(path_col) -> F.Column:
    """Extension → lang column expression (one chained CASE, codegen'd)."""
    name = F.element_at(F.split(path_col, "/"), -1)
    ext = F.lower(F.regexp_extract(name, r"\.([A-Za-z0-9_]+)$", 1))
    out = F.lit("unknown")
    for e, lang in sorted(LANG_BY_EXT.items(), reverse=True):
        out = F.when(ext == e, F.lit(lang)).otherwise(out)
    return out


def read_source_tree(
    spark: SparkSession,
    root: str,
    repo: str | None = None,
    commit: str = "HEAD",
    glob: str | None = None,
    max_bytes: int = DEFAULT_MAX_BYTES,
) -> DataFrame:
    """→ (repo, path, commit, lang, content): every non-hidden file under
    ``root`` (recursive), read distributed via the binaryFile source.

    ``glob`` restricts files by name (e.g. ``"*.py"`` — pushed into the
    listing as pathGlobFilter, so excluded files are never opened);
    ``max_bytes`` drops oversized files on the length METADATA column
    (never decoded, never held).  Compose ``with_doc_ids`` on top for the
    engine's dense id contract (it keys on (repo, path, commit)).
    """
    norm_root = os.path.abspath(root).rstrip("/")
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(norm_root)
    rel = F.regexp_replace(
        F.col("_path"), "^.*" + re.escape(norm_root) + "/", ""
    )
    return (
        raw.filter(F.col("length") <= max_bytes)
        .withColumnRenamed("path", "_path")
        .select(
            F.lit(repo if repo is not None else os.path.basename(norm_root))
            .alias("repo"),
            rel.alias("path"),
            F.lit(commit).alias("commit"),
            # cast interprets the bytes as UTF-8 without validating;
            # make_valid_utf8 then rewrites any invalid sequence to U+FFFD
            # (Spark 4's decode() instead THROWS on malformed input, which
            # is wrong for a corpus scan — one latin-1 stray would fail the
            # whole job).  Both steps are JVM expressions, no Python.
            F.make_valid_utf8(F.col("content").cast("string")).alias("content"),
        )
        .withColumn("lang", lang_from_path(F.col("path")))
        .select("repo", "path", "commit", "lang", "content")
    )
