"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` on DuckDB over the same parquet, compare
row-count, schema (column names) and values.  Uses sf0.001 for speed; the
driver runs the same comparison at sf0.01."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    oracle = entrymod.oracle_sql()
    if name not in oracle:
        pytest.skip("rows-only op (no SQL oracle)")
    got = _canon(entrymod.queries()[name](spark, SF_DIR).toPandas())
    want = _canon(ddb.execute(oracle[name]).df())
    assert list(got.columns) == list(want.columns), f"schema mismatch: {got.columns} vs {want.columns}"
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            gv, wv = g.astype(float).values, w.astype(float).values
            both_nan = np.isnan(gv) & np.isnan(wv)
            close = np.isclose(gv, wv, rtol=0, atol=5e-7) | both_nan
            assert close.all(), (
                f"{name}.{c}: {np.count_nonzero(~close)} mismatches, "
                f"max diff {np.nanmax(np.abs(gv - wv))}"
            )
        else:
            eq = (g.values == w.values) | (g.isna().values & w.isna().values)
            assert eq.all(), f"{name}.{c}: {np.count_nonzero(~eq)} value mismatches"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"query", "rank", "docID", "score"}
    assert all(not math.isnan(r["score"]) for r in rows)


def test_readme_operator_catalog_matches_registry():
    """README's operator catalog is generated from queries() and may not
    drift: regenerating it must reproduce the committed text exactly
    (refresh with `python -m searchenginesimple_spark.catalog`), and the
    registry stays at exactly 50 entries (the driver's checked window)."""
    import os

    from searchenginesimple_spark import catalog

    rows = catalog.operator_catalog_rows()
    assert len(rows) == 50
    assert [r[0] for r in rows] == list(entrymod.queries().keys())
    readme = open(os.path.join(catalog._REPO, "README.md")).read()
    assert catalog.render_catalog() in readme
