"""Source-tree ingest (sources/files.py): the distributed DirScanner/ReadAll
analogue (reference ``include/Page/Page.hpp:37-72``, ``include/helper/
readAll.hpp:10-15``) — recursive listing, dotfile skip, bounded read,
deterministic UTF-8 repair, extension→lang, and composition with the
engine's dense-id contract."""

import os

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.sources.corpus import with_doc_ids
from searchenginesimple_spark.sources.files import (
    DEFAULT_MAX_BYTES,
    lang_from_path,
    read_source_tree,
)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("srctree")
    (root / "src" / "sub").mkdir(parents=True)
    (root / ".git").mkdir()
    (root / "src" / "a.py").write_text("def f():\n    return 1\n")
    (root / "src" / "sub" / "b.cc").write_text("int main() { return 0; }\n")
    (root / ".git" / "config").write_text("should never be scanned\n")
    (root / ".hidden.py").write_text("also skipped\n")
    (root / "README.md").write_text("# readme\n")
    (root / "Makefile").write_text("all:\n\ttrue\n")
    (root / "src" / "stray.bin").write_bytes(b"caf\xe9 latin-1 \xff")
    (root / "big.txt").write_text("x" * 4096)
    return str(root)


def test_scan_skips_hidden_reads_all_else(spark, tree):
    rows = {r.path: r for r in read_source_tree(spark, tree, repo="demo", commit="c1").collect()}
    # everything non-hidden, recursively; nothing under .git, no dotfiles
    assert sorted(rows) == [
        "Makefile", "README.md", "big.txt", "src/a.py", "src/stray.bin", "src/sub/b.cc",
    ]
    # whole-file read: content is the exact file text
    assert rows["src/a.py"].content == "def f():\n    return 1\n"
    assert rows["src/sub/b.cc"].content == "int main() { return 0; }\n"
    # caller metadata flows through
    assert rows["README.md"].repo == "demo" and rows["README.md"].commit == "c1"


def test_schema_is_input_hint_shape(spark, tree):
    df = read_source_tree(spark, tree)
    assert [f.name for f in df.schema.fields] == ["repo", "path", "commit", "lang", "content"]
    assert {f.dataType.simpleString() for f in df.schema.fields} == {"string"}


def test_lang_from_extension(spark, tree):
    langs = {r.path: r.lang for r in read_source_tree(spark, tree).select("path", "lang").collect()}
    assert langs["src/a.py"] == "python"
    assert langs["src/sub/b.cc"] == "cpp"
    assert langs["README.md"] == "markdown"
    assert langs["big.txt"] == "text"
    assert langs["Makefile"] == "unknown"       # no extension
    assert langs["src/stray.bin"] == "unknown"  # unmapped extension


def test_invalid_utf8_repaired_like_python_replace(spark, tree):
    raw = b"caf\xe9 latin-1 \xff"
    row = (
        read_source_tree(spark, tree)
        .filter(F.col("path") == "src/stray.bin")
        .first()
    )
    # deterministic U+FFFD repair, bit-identical to Python's errors='replace'
    assert row.content == raw.decode("utf-8", "replace")
    assert "�" in row.content


def test_max_bytes_drops_before_decode(spark, tree):
    paths = {r.path for r in read_source_tree(spark, tree, max_bytes=1024).select("path").collect()}
    assert "big.txt" not in paths
    assert "src/a.py" in paths
    assert DEFAULT_MAX_BYTES == 1 << 20


def test_glob_pushes_into_listing(spark, tree):
    df = read_source_tree(spark, tree, glob="*.py")
    assert [r.path for r in df.select("path").collect()] == ["src/a.py"]
    # the filter is a listing option, not a post-read filter: the scan's
    # input files are only the matching ones
    files = df.inputFiles()
    assert all(f.endswith(".py") for f in files) and len(files) == 1


def test_default_repo_is_basename_and_commit_head(spark, tree):
    row = read_source_tree(spark, tree).select("repo", "commit").first()
    assert row.repo == os.path.basename(tree.rstrip("/"))
    assert row.commit == "HEAD"


def test_composes_with_dense_doc_ids(spark, tree):
    docs = read_source_tree(spark, tree, repo="demo", commit="c1")
    with_ids = with_doc_ids(docs)
    ids = sorted(r.doc_id for r in with_ids.select("doc_id").collect())
    assert ids == list(range(6))  # dense 0..n-1 over the 6 scanned files
    # deterministic: same tree → same id per key
    again = {
        (r.repo, r.path): r.doc_id
        for r in with_doc_ids(docs).select("repo", "path", "doc_id").collect()
    }
    first = {
        (r.repo, r.path): r.doc_id
        for r in with_ids.select("repo", "path", "doc_id").collect()
    }
    assert again == first


def test_lang_expr_is_codegen_case_chain(spark):
    # lang_from_path is a pure column expression — usable on any path col
    df = spark.createDataFrame(
        [("x/y/mod.RS",), ("noext",), ("deep/p.tar.gz",)], "p string"
    ).select(lang_from_path(F.col("p")).alias("lang"))
    assert [r.lang for r in df.collect()] == ["rust", "unknown", "unknown"]
