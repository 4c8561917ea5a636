"""Streaming trigram-index maintenance (streaming/index.py).

Pins: (1) a drained document stream leaves the index answering searches
identically to the brute-force scan over the full current corpus;
(2) micro-batches land as separate delta shards; (3) re-running the
drained query against the same checkpoint is a no-op (no new shards, no
result change) — the idempotency half of the exactly-once story.
"""

from __future__ import annotations

import os

import pytest

from searchenginesimple_spark.operators.trigram import (
    build_trigram_index,
    read_trigram_index,
    trigram_search,
    trigram_search_bruteforce,
    write_trigram_index,
)
from searchenginesimple_spark.streaming.index import stream_trigram_deltas

BASE = [(1, "def base_doc(): return base_marker")]
STREAMED = [
    (2, "def first_streamed(): return streamed_marker_one"),
    (3, "def second_streamed(): return streamed_marker_two"),
]
NEEDLES = [
    (0, "base_marker"),
    (1, "streamed_marker_one"),
    (2, "streamed_marker_two"),
    (3, "return"),
]


@pytest.fixture()
def dirs(tmp_path):
    return {
        "idx": str(tmp_path / "idx"),
        "in": str(tmp_path / "incoming"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _drain(spark, dirs):
    stream = (
        spark.readStream.schema("doc_id long, content string")
        .option("maxFilesPerTrigger", 1)  # force one shard per input file
        .parquet(dirs["in"])
    )
    q = stream_trigram_deltas(stream, dirs["idx"], dirs["ckpt"])
    q.awaitTermination(120)
    assert not q.isActive
    assert q.exception() is None


def _shards(dirs):
    d = f"{dirs['idx']}/deltas"
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def test_streamed_deltas_serve_searches(spark, dirs):
    base_docs = spark.createDataFrame(BASE, "doc_id long, content string")
    raw, _ = build_trigram_index(base_docs)
    write_trigram_index(raw, dirs["idx"])

    for i, row in enumerate(STREAMED):
        spark.createDataFrame([row], "doc_id long, content string").coalesce(
            1
        ).write.mode("append").parquet(dirs["in"])
    _drain(spark, dirs)
    assert len(_shards(dirs)) == 2  # maxFilesPerTrigger=1 → shard per file

    current = spark.createDataFrame(BASE + STREAMED, "doc_id long, content string")
    needles = spark.createDataFrame(NEEDLES, "needle_id long, needle string")
    postings, stats = read_trigram_index(spark, dirs["idx"])
    got = sorted(map(tuple, trigram_search(current, postings, stats, needles).collect()))
    want = sorted(map(tuple, trigram_search_bruteforce(current, needles).collect()))
    assert got == want
    assert {(r[0], r[2]) for r in got} >= {(0, 1), (1, 2), (2, 3), (3, 1), (3, 2), (3, 3)}

    # drained query re-run on the same checkpoint: no new shards, same answers
    before = _shards(dirs)
    _drain(spark, dirs)
    assert _shards(dirs) == before
    postings2, stats2 = read_trigram_index(spark, dirs["idx"])
    got2 = sorted(
        map(tuple, trigram_search(current, postings2, stats2, needles).collect())
    )
    assert got2 == got
