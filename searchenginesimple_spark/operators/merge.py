"""Compressed posting-run merge — the "merge" of the north rule's
"posting-list construction, merge, compression, top-k scoring".

The reference rebuilds its whole in-memory index on every run
(``src/page.cc`` main → ``Page.hpp:262-381``); at 10^12-file scale an index
must grow by MERGING a delta build into the base.  Two layers:

* THIS module — the run-level merge: two compressed posting sets (same
  schema as ``operators/postings.py``) → one, per ``(term, shard)``.  Only
  groups present on BOTH sides are decoded/re-encoded (an Arrow-batched
  numpy UDF); one-sided groups pass through byte-identical, never touching
  Python.  With shard-aligned increments (``plans/merge.py``) the overlap is
  EMPTY by construction and the merge is pure partition arithmetic.
* ``plans/merge.py`` — the index-level increment: new docs land in fresh
  shards, base partitions are immutable (LSM-style), only the two global
  tables are rewritten.

Caller contract: the two sides' doc_id sets are disjoint (a doc belongs to
exactly one build generation).  Runs may interleave in doc_id order — the
merge re-sorts; a duplicate doc_id raises inside the UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from searchenginesimple_spark.config import DEFAULT, EngineConfig
from searchenginesimple_spark.functions.codec import (
    delta_decode,
    varbyte_decode,
)
from searchenginesimple_spark.operators.postings import _POSTING_STRUCT

_POSTING_COLS = ["term", "shard", "df", "ids", "tfs", "block_last_id", "block_max_tf"]


def _decode_run(ids_buf: bytes, tfs_buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    return (
        delta_decode(varbyte_decode(ids_buf)),
        varbyte_decode(tfs_buf),
    )


def _make_merge_udf(block_size: int):
    from searchenginesimple_spark.functions.codec import (
        block_stats_rows,
        delta_encode_rows,
        varbyte_encode_rows,
    )

    @pandas_udf(_POSTING_STRUCT)
    def merge_runs(
        a_ids: pd.Series, a_tfs: pd.Series, b_ids: pd.Series, b_tfs: pd.Series
    ) -> pd.DataFrame:
        """Per row: decode both runs, interleave-sort by doc_id, re-encode.
        Decode is numpy-vectorized per buffer; the re-encode flattens the
        whole Arrow batch and runs the same one-pass row encoders as the
        build (postings.py:_make_encode_udf)."""
        n = len(a_ids)
        ids_rows: list[np.ndarray] = []
        tfs_rows: list[np.ndarray] = []
        for i in range(n):
            ia, ta = _decode_run(a_ids.iloc[i], a_tfs.iloc[i])
            ib, tb = _decode_run(b_ids.iloc[i], b_tfs.iloc[i])
            ids_c = np.concatenate([ia, ib])
            tfs_c = np.concatenate([ta, tb])
            if ia.size and ib.size and ia[-1] >= ib[0]:
                # runs interleave (delta ids above base ids is the common
                # case and skips this): stable re-sort by doc_id
                order = np.argsort(ids_c, kind="stable")
                ids_c, tfs_c = ids_c[order], tfs_c[order]
            if ids_c.size > 1 and (ids_c[1:] == ids_c[:-1]).any():
                raise ValueError(
                    "merge_postings: duplicate doc_id across runs — the two "
                    "sides' doc_id sets must be disjoint"
                )
            ids_rows.append(ids_c)
            tfs_rows.append(tfs_c)
        row_lens = np.fromiter((len(x) for x in ids_rows), dtype=np.int64, count=n)
        if row_lens.sum() == 0:
            return pd.DataFrame(
                {"df": [0] * n, "ids": [b""] * n, "tfs": [b""] * n,
                 "block_last_id": [[]] * n, "block_max_tf": [[]] * n}
            )
        flat_ids = np.concatenate(ids_rows)
        flat_tfs = np.concatenate(tfs_rows)
        id_buf, id_offs = varbyte_encode_rows(
            delta_encode_rows(flat_ids, row_lens), row_lens
        )
        tf_buf, tf_offs = varbyte_encode_rows(flat_tfs, row_lens)
        last, mx, reps = block_stats_rows(flat_ids, flat_tfs, row_lens, block_size)
        blk_offs = np.concatenate([[0], np.cumsum(reps)])
        idv, tfv = memoryview(id_buf), memoryview(tf_buf)
        return pd.DataFrame(
            {
                "df": row_lens.astype(np.int32),
                "ids": [bytes(idv[id_offs[i] : id_offs[i + 1]]) for i in range(n)],
                "tfs": [bytes(tfv[tf_offs[i] : tf_offs[i + 1]]) for i in range(n)],
                "block_last_id": [
                    last[blk_offs[i] : blk_offs[i + 1]].tolist() for i in range(n)
                ],
                "block_max_tf": [
                    mx[blk_offs[i] : blk_offs[i + 1]].astype(np.int32).tolist()
                    for i in range(n)
                ],
            }
        )

    return merge_runs


def merge_postings(
    base: DataFrame, delta: DataFrame, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """Merge two compressed posting sets into one.

    Physical shape: an inner join on ``(term, shard)`` finds the overlapping
    groups (each side contributes exactly one run per group — the build
    guarantees that); only those rows cross into the Arrow merge UDF.  The
    two anti-join remainders pass through with their bytes and block
    metadata untouched.  Shuffle is keyed (term, shard) — the same salt as
    the build, so group sizes stay bounded by ``shard_span`` postings.
    """
    a = base.select(*_POSTING_COLS)
    b = delta.select(*_POSTING_COLS)
    key = ["term", "shard"]
    overlap = (
        a.select(key[0], key[1], F.col("ids").alias("a_ids"), F.col("tfs").alias("a_tfs"))
        .join(
            b.select(key[0], key[1], F.col("ids").alias("b_ids"), F.col("tfs").alias("b_tfs")),
            key,
        )
    )
    merge = _make_merge_udf(cfg.block_size)
    merged = overlap.select(
        "term", "shard", merge("a_ids", "a_tfs", "b_ids", "b_tfs").alias("p")
    ).select(
        "term", "shard", "p.df", "p.ids", "p.tfs", "p.block_last_id", "p.block_max_tf"
    )
    only_a = a.join(b.select(*key), key, "left_anti")
    only_b = b.join(a.select(*key), key, "left_anti")
    return only_a.unionByName(only_b).unionByName(merged)


_DOCPACK_COLS = ["shard", "n", "sum_dlen", "ids", "dlens"]


def merge_doc_stats_packed(
    base: DataFrame, delta: DataFrame, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """Merge two per-shard packed doc-stats sidecars (same shape as
    ``build_doc_stats_packed``): overlap shards re-pack, others pass through."""
    from searchenginesimple_spark.functions.codec import (
        delta_encode,
        varbyte_encode,
    )

    # ids are delta+varbyte, dlens are RAW varbyte (postings.py:_encode_doc_stats)
    @pandas_udf("n int, sum_dlen long, ids binary, dlens binary")
    def _merge_pack(
        a_ids: pd.Series, a_dl: pd.Series, b_ids: pd.Series, b_dl: pd.Series
    ) -> pd.DataFrame:
        out = {"n": [], "sum_dlen": [], "ids": [], "dlens": []}
        for i in range(len(a_ids)):
            ia = delta_decode(varbyte_decode(a_ids.iloc[i]))
            ib = delta_decode(varbyte_decode(b_ids.iloc[i]))
            da = varbyte_decode(a_dl.iloc[i])
            db = varbyte_decode(b_dl.iloc[i])
            ids_c = np.concatenate([ia, ib])
            dl_c = np.concatenate([da, db])
            order = np.argsort(ids_c, kind="stable")
            ids_c, dl_c = ids_c[order], dl_c[order]
            if ids_c.size > 1 and (ids_c[1:] == ids_c[:-1]).any():
                raise ValueError("merge_doc_stats_packed: duplicate doc_id")
            out["n"].append(len(ids_c))
            out["sum_dlen"].append(int(dl_c.sum()))
            out["ids"].append(varbyte_encode(delta_encode(ids_c)))
            out["dlens"].append(varbyte_encode(dl_c))
        return pd.DataFrame(out)

    a = base.select(*_DOCPACK_COLS)
    b = delta.select(*_DOCPACK_COLS)
    overlap = a.select(
        "shard", F.col("ids").alias("a_ids"), F.col("dlens").alias("a_dl")
    ).join(
        b.select("shard", F.col("ids").alias("b_ids"), F.col("dlens").alias("b_dl")),
        "shard",
    )
    merged = overlap.select(
        "shard", _merge_pack("a_ids", "a_dl", "b_ids", "b_dl").alias("p")
    ).select("shard", "p.n", "p.sum_dlen", "p.ids", "p.dlens")
    only_a = a.join(b.select("shard"), "shard", "left_anti")
    only_b = b.join(a.select("shard"), "shard", "left_anti")
    return only_a.unionByName(only_b).unionByName(merged)


_DECODE_STRUCT = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("tfs", T.ArrayType(T.LongType())),
    ]
)


@pandas_udf(_DECODE_STRUCT)
def _decode_posting_udf(ids: pd.Series, tfs: pd.Series) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "ids": [
                delta_decode(varbyte_decode(x)).astype(np.int64).tolist() for x in ids
            ],
            "tfs": [varbyte_decode(x).astype(np.int64).tolist() for x in tfs],
        }
    )


def decode_postings(postings: DataFrame) -> DataFrame:
    """Compressed postings → flat (term, doc_id, tf) rows — the codec's
    inverse as a DataFrame op (test/oracle surface; not a query path)."""
    dec = (
        postings.select("term", _decode_posting_udf("ids", "tfs").alias("d"))
        .select("term", F.col("d.ids").alias("_ids"), F.col("d.tfs").alias("_tfs"))
        .select("term", F.explode(F.arrays_zip("_ids", "_tfs")).alias("z"))
    )
    return dec.select(
        "term",
        F.col("z._ids").cast("long").alias("doc_id"),
        F.col("z._tfs").cast("long").alias("tf"),
    )
