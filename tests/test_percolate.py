"""Streaming percolation (streaming/percolate.py).

Pins: (1) a drained document stream's accumulated matches ≡ batch
boolean_search over the same corpus (the repo's batch≡streaming
discipline); (2) micro-batches land as separate committed batch dirs;
(3) re-running the drained query on the same checkpoint is a no-op;
(4) a malformed standing query fails at registration, before any stream
starts.
"""

from __future__ import annotations

import os

import pytest

from searchenginesimple_spark.operators.boolquery import boolean_search
from searchenginesimple_spark.operators.trigram import build_trigram_index
from searchenginesimple_spark.streaming.percolate import (
    read_percolated,
    stream_percolate,
)

DOCS = [
    (1, "src/a.py", "py", "def crypto_sign(): return seal"),
    (2, "src/b.py", "py", "def vendor_crypto(): pass"),
    (3, "lib/c.js", "js", "function crypto() { return 1 }"),
    (4, "src/d.py", "py", "plain file, nothing interesting"),
]
SCHEMA = "doc_id long, path string, lang string, content string"

QUERIES = [
    (0, "crypto -vendor"),
    (1, "lang:py crypto"),
    (2, "return OR pass"),
    (3, "absent_zzz"),
    (4, "re:def.crypto"),   # regex atoms ride the standing algebra
    (5, "sym:crypto"),      # ...and symbol atoms (definition sites)
]


@pytest.fixture()
def dirs(tmp_path):
    return {
        "in": str(tmp_path / "incoming"),
        "out": str(tmp_path / "matches"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _drain(spark, dirs, queries=QUERIES):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per input file
        .parquet(dirs["in"])
    )
    q = stream_percolate(stream, queries, dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    assert not q.isActive
    assert q.exception() is None


def _batches(dirs):
    d = dirs["out"]
    return sorted(x for x in os.listdir(d)) if os.path.isdir(d) else []


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_percolate_matches_batch_search(spark, dirs):
    for row in DOCS:
        spark.createDataFrame([row], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["in"])
    _drain(spark, dirs)
    assert len(_batches(dirs)) == len(DOCS)  # maxFilesPerTrigger=1

    got = _rows(read_percolated(spark, dirs["out"]))
    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, stats = build_trigram_index(docs)
    want = _rows(boolean_search(docs, postings, stats, QUERIES))
    assert got == want
    by_qid = {r[0] for r in got}
    assert {0, 1, 2, 4, 5} <= by_qid and 3 not in by_qid
    # the negation actually pruned: doc 2 (vendor_crypto) not under query 0
    assert (0, QUERIES[0][1], 2) not in got

    # drained re-run on the same checkpoint: no new batches, same matches
    before = _batches(dirs)
    _drain(spark, dirs)
    assert _batches(dirs) == before
    assert _rows(read_percolated(spark, dirs["out"])) == got


def test_malformed_standing_query_fails_at_registration(spark, dirs):
    os.makedirs(dirs["in"], exist_ok=True)
    stream = spark.readStream.schema(SCHEMA).parquet(dirs["in"])
    with pytest.raises(ValueError):
        stream_percolate(stream, [(0, "a OR")], dirs["out"], dirs["ckpt"])
    assert not os.path.isdir(dirs["ckpt"])  # nothing started
