"""Source-tree ingest (sources/files.py): the distributed DirScanner/ReadAll
analogue (reference ``include/Page/Page.hpp:37-72``, ``include/helper/
readAll.hpp:10-15``) — recursive walk with dotfile-only skip (underscore
names KEPT, unlike Spark's listing rule), bounded read, deterministic
UTF-8 repair, extension→lang, and composition with the dense-id contract."""

import os

import pytest
from pyspark.sql import functions as F

from searchenginesimple_spark.sources.corpus import with_doc_ids
from searchenginesimple_spark.sources.files import (
    DEFAULT_MAX_BYTES,
    _seed_frontier,
    lang_from_path,
    read_source_tree,
)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("srctree")
    (root / "src" / "sub").mkdir(parents=True)
    (root / "src" / "_vendor").mkdir()
    (root / ".git").mkdir()
    (root / "src" / "a.py").write_text("def f():\n    return 1\n")
    (root / "src" / "__init__.py").write_text("from .a import f\n")
    (root / "src" / "sub" / "b.cc").write_text("int main() { return 0; }\n")
    (root / "src" / "_vendor" / "v.py").write_text("vendored = True\n")
    (root / ".git" / "config").write_text("should never be scanned\n")
    (root / ".hidden.py").write_text("also skipped\n")
    (root / "README.md").write_text("# readme\n")
    (root / "Makefile").write_text("all:\n\ttrue\n")
    (root / "src" / "stray.bin").write_bytes(b"caf\xe9 latin-1 \xff")
    (root / "big.txt").write_text("x" * 4096)
    return str(root)


ALL_PATHS = [
    "Makefile", "README.md", "big.txt", "src/__init__.py", "src/_vendor/v.py",
    "src/a.py", "src/stray.bin", "src/sub/b.cc",
]


def test_walk_skips_dotfiles_keeps_underscores(spark, tree):
    """The reference rule: dotfiles out, EVERYTHING else in — including
    __init__.py and _-prefixed dirs, which Spark's own listing would drop."""
    rows = {r.path: r for r in read_source_tree(spark, tree, repo="demo", commit="c1").collect()}
    assert sorted(rows) == ALL_PATHS
    # whole-file read: content is the exact file text
    assert rows["src/a.py"].content == "def f():\n    return 1\n"
    assert rows["src/__init__.py"].content == "from .a import f\n"
    # caller metadata flows through
    assert rows["README.md"].repo == "demo" and rows["README.md"].commit == "c1"


def test_spark_mode_inherits_hidden_rule(spark, tree):
    """mode='spark' (the object-store path) uses Spark's listing, which also
    hides _-prefixed names — pinned here so the divergence stays visible."""
    paths = {r.path for r in read_source_tree(spark, tree, mode="spark").select("path").collect()}
    assert paths == {"Makefile", "README.md", "big.txt", "src/a.py", "src/stray.bin", "src/sub/b.cc"}


def test_schema_is_input_hint_shape(spark, tree):
    for mode in ("walk", "spark"):
        df = read_source_tree(spark, tree, mode=mode)
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
    """Both decode engines repair to U+FFFD, bit-identical to Python's
    errors='replace' — so downstream hashes don't depend on the mode."""
    raw = b"caf\xe9 latin-1 \xff"
    for mode in ("walk", "spark"):
        row = (
            read_source_tree(spark, tree, mode=mode)
            .filter(F.col("path") == "src/stray.bin")
            .first()
        )
        assert row.content == raw.decode("utf-8", "replace"), mode
        assert "�" in row.content


def test_max_bytes_drops_before_read(spark, tree):
    for mode in ("walk", "spark"):
        paths = {r.path for r in read_source_tree(spark, tree, max_bytes=1024, mode=mode).select("path").collect()}
        assert "big.txt" not in paths, mode
        assert "src/a.py" in paths, mode
    assert DEFAULT_MAX_BYTES == 1 << 20


def test_glob_filters_by_filename(spark, tree):
    walk = read_source_tree(spark, tree, glob="*.py")
    assert sorted(r.path for r in walk.select("path").collect()) == [
        "src/__init__.py", "src/_vendor/v.py", "src/a.py",
    ]
    # spark mode: the filter is a listing option, not a post-read filter —
    # the scan's input files are only the matching ones
    df = read_source_tree(spark, tree, glob="*.py", mode="spark")
    files = df.inputFiles()
    assert all(f.endswith(".py") for f in files) and len(files) == 1


def test_root_reoccurring_in_subpath_not_overstripped(spark, tmp_path):
    """A path containing the root string again deeper down must keep its
    full repo-relative path (non-greedy prefix strip in spark mode; walk
    mode uses os.path.relpath and is immune by construction)."""
    root = tmp_path / "rootx"
    nested = root / "vendor" / str(root).lstrip("/")
    nested.mkdir(parents=True)
    (nested / "f.py").write_text("deep\n")
    (root / "f.py").write_text("shallow\n")
    expect = {"f.py", os.path.join("vendor", str(root).lstrip("/"), "f.py")}
    for mode in ("walk", "spark"):
        got = {r.path for r in read_source_tree(spark, str(root), mode=mode).select("path").collect()}
        assert got == expect, mode


def test_uri_roots_route_to_spark_mode(spark, tree):
    # a scheme'd root must not be abspath-mangled: file:// URIs load fine
    df = read_source_tree(spark, "file://" + tree, repo="demo")
    assert {r.path for r in df.select("path").collect()} >= {"src/a.py", "README.md"}
    # and walk mode refuses them loudly instead of os.walk-ing a nonsense path
    with pytest.raises(ValueError, match="POSIX"):
        read_source_tree(spark, "file://" + tree, mode="walk")
    with pytest.raises(ValueError, match="mode"):
        read_source_tree(spark, tree, mode="bogus")


def test_default_repo_is_basename_and_commit_head(spark, tree):
    row = read_source_tree(spark, tree).select("repo", "commit").first()
    assert row.repo == os.path.basename(tree.rstrip("/"))
    assert row.commit == "HEAD"


def test_seed_frontier_is_shallow_and_complete(tree):
    files, dirs = _seed_frontier(tree, 2)
    # depth-2 frontier: top-level files + src's children as dir seeds
    assert {os.path.relpath(f, tree) for f in files} == {"Makefile", "README.md", "big.txt"} | {
        "src/a.py", "src/__init__.py", "src/stray.bin",
    }
    assert {os.path.relpath(d, tree) for d in dirs} == {"src/sub", "src/_vendor"}
    # nothing hidden ever seeds
    assert not any("/.git" in d for d in dirs)


def test_composes_with_dense_doc_ids(spark, tree):
    docs = read_source_tree(spark, tree, repo="demo", commit="c1")
    with_ids = with_doc_ids(docs)
    ids = sorted(r.doc_id for r in with_ids.select("doc_id").collect())
    assert ids == list(range(len(ALL_PATHS)))  # dense 0..n-1
    # deterministic: same tree → same id per key; and re-derivation over an
    # already-ided frame (the build-plan path) reproduces the same ids
    first = {
        (r.repo, r.path): r.doc_id
        for r in with_ids.select("repo", "path", "doc_id").collect()
    }
    again = {
        (r.repo, r.path): r.doc_id
        for r in with_doc_ids(with_ids).select("repo", "path", "doc_id").collect()
    }
    assert again == first


def test_with_doc_ids_rederives_over_filtered_set(spark, tree):
    """The dense-over-THIS-input contract: feeding an ided frame back in
    after filtering re-ranks 0..m-1 (what plans/merge.py's first_id
    offsetting depends on), instead of keeping gap-carrying stale ids."""
    ided = with_doc_ids(read_source_tree(spark, tree))
    kept = ided.filter(F.col("lang") == "python")  # 3 of 8 docs
    re_ided = with_doc_ids(kept)
    assert sorted(r.doc_id for r in re_ided.select("doc_id").collect()) == [0, 1, 2]


def test_lang_expr_is_flat_map_lookup(spark):
    # lang_from_path is a pure column expression — usable on any path col
    df = spark.createDataFrame(
        [("x/y/mod.RS",), ("noext",), ("deep/p.tar.gz",)], "p string"
    ).select(lang_from_path(F.col("p")).alias("lang"))
    assert [r.lang for r in df.collect()] == ["rust", "unknown", "unknown"]
