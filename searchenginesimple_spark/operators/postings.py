"""Partition-parallel posting-list construction (north rule core).

Re-expresses the reference's single-threaded in-memory inverted-index build
(``include/Page/Page.hpp:275-335``: token loop → ``std::map<term, map<doc,w>>``)
and its dead MapReduce coordinator/worker intent (``src/MapReduce/*``,
SURVEY.md §3.4) as one declarative Spark job with explicit skew handling:

* **Doc-range sharding as the salt.**  The shuffle key is ``(term, shard)``
  where ``shard = doc_id // shard_span`` — a *range* salt, so every shard's
  posting run is (a) bounded in size regardless of term hotness (the planted
  20 %-frequency hot term lands in every shard instead of one reducer), and
  (b) already in global doc_id order across shards, so no second-stage merge
  shuffle is needed: a term's full posting list is the shard-ordered
  concatenation.  This is the salted-repartition construction the north rule
  names, with the salt chosen so the "merge" is free.
* **Sorted runs, delta+varbyte compressed** (functions/codec.py), with
  per-block (last doc_id, max tf) metadata for block-max pruning
  (operators/wand.py).
* **Arrow-batched encode** — the varbyte encoder is a pandas UDF over the
  grouped, sorted arrays; numpy inside, no per-row Python.

Output tables (FIXTURES.md §3 schemas, sharded):

    postings(term, shard, df, ids:binary, tfs:binary,
             block_last_id:array<long>, block_max_tf:array<int>)
    doc_stats_packed(shard, n, ids:binary, dlens:binary)
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
    block_stats,
    delta_encode,
    varbyte_encode,
)

_POSTING_STRUCT = T.StructType(
    [
        T.StructField("df", T.IntegerType()),
        T.StructField("ids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("block_last_id", T.ArrayType(T.LongType())),
        T.StructField("block_max_tf", T.ArrayType(T.IntegerType())),
    ]
)


def _make_encode_udf(block_size: int):
    from searchenginesimple_spark.functions.codec import (
        block_stats_rows,
        delta_encode_rows,
        varbyte_encode_rows,
    )

    @pandas_udf(_POSTING_STRUCT)
    def encode_postings(ids: pd.Series, tfs: pd.Series) -> pd.DataFrame:
        """Whole-batch vectorized encode: the Arrow batch's rows are flattened
        into single numpy arrays, encoded in one pass, and sliced back per
        row — O(rows) python work is just memoryview slicing.  (A per-row
        encode loop was the posting-build hot spot: ~1M singleton rows.)"""
        n = len(ids)
        row_lens = np.fromiter((len(x) for x in ids), dtype=np.int64, count=n)
        if row_lens.sum() == 0:
            return pd.DataFrame(
                {"df": [0] * n, "ids": [b""] * n, "tfs": [b""] * n,
                 "block_last_id": [[]] * n, "block_max_tf": [[]] * n}
            )
        flat_ids = np.concatenate([np.asarray(x, dtype=np.uint64) for x in ids])
        flat_tfs = np.concatenate([np.asarray(x, dtype=np.uint64) for x in tfs])
        id_buf, id_offs = varbyte_encode_rows(delta_encode_rows(flat_ids, row_lens), row_lens)
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

    return encode_postings


_DOCPACK_STRUCT = T.StructType(
    [
        T.StructField("n", T.IntegerType()),
        T.StructField("sum_dlen", T.LongType()),
        T.StructField("ids", T.BinaryType()),
        T.StructField("dlens", T.BinaryType()),
    ]
)


@pandas_udf(_DOCPACK_STRUCT)
def _encode_doc_stats(ids: pd.Series, dlens: pd.Series) -> pd.DataFrame:
    out = {"n": [], "sum_dlen": [], "ids": [], "dlens": []}
    for id_arr, dl_arr in zip(ids, dlens):
        a = np.asarray(id_arr, dtype=np.uint64)
        d = np.asarray(dl_arr, dtype=np.uint64)
        out["n"].append(len(a))
        out["sum_dlen"].append(int(d.sum()))  # → global avgdl without re-decoding
        out["ids"].append(varbyte_encode(delta_encode(a)))
        out["dlens"].append(varbyte_encode(d))
    return pd.DataFrame(out)


def shard_of(doc_id_col, cfg: EngineConfig = DEFAULT):
    return F.floor(doc_id_col / F.lit(cfg.shard_span)).cast("int")


def build_postings(tf: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """tf(doc_id, term, tf) → compressed sharded postings.

    One shuffle, keyed (term, shard).  ``sort_array(collect_list(struct))``
    sorts by the struct's first field (doc_id) JVM-side, handing the encoder
    presorted runs.  Per-group size ≤ shard_span postings by construction —
    the skew bound the north rule asks for.
    """
    sharded = tf.withColumn("shard", shard_of(F.col("doc_id"), cfg))
    grouped = (
        sharded.repartition(cfg.shuffle_partitions, "term", "shard")
        .groupBy("term", "shard")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "tf"))).alias("plist"))
        .select(
            "term",
            "shard",
            F.transform("plist", lambda x: x.doc_id).alias("id_arr"),
            F.transform("plist", lambda x: x.tf.cast("long")).alias("tf_arr"),
        )
    )
    enc = _make_encode_udf(cfg.block_size)
    return grouped.select(
        "term", "shard", enc("id_arr", "tf_arr").alias("p")
    ).select("term", "shard", "p.df", "p.ids", "p.tfs", "p.block_last_id", "p.block_max_tf")


def build_doc_stats_packed(doc_stats: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """doc_stats(doc_id, dlen) → per-shard packed (ids, dlens) sidecar."""
    grouped = (
        doc_stats.withColumn("shard", shard_of(F.col("doc_id"), cfg))
        .groupBy("shard")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "dlen"))).alias("ds"))
        .select(
            "shard",
            F.transform("ds", lambda x: x.doc_id).alias("id_arr"),
            F.transform("ds", lambda x: x.dlen.cast("long")).alias("dl_arr"),
        )
    )
    return grouped.select("shard", _encode_doc_stats("id_arr", "dl_arr").alias("p")).select(
        "shard", "p.n", "p.sum_dlen", "p.ids", "p.dlens"
    )


def postings_stats(tf: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Per-shard index metrics → (shard, n_terms, n_postings, n_tokens).

    The queryable form of the north rule's "docs/postings/bytes per
    partition" build metrics (plans/build.py persists the same rollup to the
    metrics table during checkpointed builds): one hash agg over the tf
    table, keyed by the same doc-range shard as the posting build.
    """
    return (
        tf.withColumn("shard", shard_of(F.col("doc_id"), cfg))
        .groupBy("shard")
        .agg(
            F.countDistinct("term").cast("long").alias("n_terms"),
            F.count("*").cast("long").alias("n_postings"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
    )
