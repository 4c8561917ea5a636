"""searchenginesimple_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch, Spark-first rebuild of the capabilities of the C++ reference
``luhcow/searchEnginesimple`` (offline inverted-index builder + online ranked
retrieval, see SURVEY.md): vectorized pandas/Arrow UDF tokenization, 64-bit
simhash near-duplicate detection with Hamming-band grouping, salted-repartition
posting-list construction (sorted docID/tf runs, delta+varbyte compressed),
BM25 top-k query scoring with block-max WAND pruning, and per-partition
checkpoint/resume with lineage + build metrics.

Everything is DataFrame-declarative so Catalyst/Tungsten/AQE pick the physical
plan; Python appears only inside Arrow-batched pandas UDFs (no per-row Python).
"""

from searchenginesimple_spark.config import EngineConfig

__version__ = "0.1.0"

__all__ = ["EngineConfig", "__version__"]
