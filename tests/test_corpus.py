"""Corpus generator determinism: distributed generation ≡ pandas generation."""

from __future__ import annotations

import pandas as pd

from searchenginesimple_spark.sources.corpus import (
    docs_df_distributed,
    generate_docs_pdf,
)


def test_distributed_equals_pandas(spark):
    want = generate_docs_pdf(300).sort_values("path").reset_index(drop=True)
    got = (
        docs_df_distributed(spark, 300, partitions=7)
        .toPandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_planted_structure():
    pdf = generate_docs_pdf(200)
    c = list(pdf["content"])
    # exact dup: i%50==11 copies i-7
    assert c[61] == c[54] and c[111] == c[104]
    # near dup: i%20==9 perturbs i-1
    assert c[29] != c[28] and "perturbed_token" in c[29]
    # short docs
    assert c[5] == "x = 1" and len(c[52]) < 10
    # hot term present and frequent
    total = sum(t.count("return") for t in c[:50])
    assert total > 500
