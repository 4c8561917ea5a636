"""CLI smoke: the spark-submit entry points build an index and answer a query
end-to-end (cli.py is the ship-to-cluster surface the north rule names)."""

from __future__ import annotations

import json


def test_cli_build_and_query(spark, tmp_path, capsys):
    import searchenginesimple_spark.cli as cli
    from searchenginesimple_spark.sources.corpus import docs_df

    corpus, idx = tmp_path / "corpus", tmp_path / "idx"
    docs_df(spark, 200).write.mode("overwrite").parquet(str(corpus))

    rc = cli.main(["build", "--input", str(corpus), "--index", str(idx)])
    assert rc == 0
    build_line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(build_line)
    assert res["n_docs"] > 0 and res["built_shards"] >= 1

    rc = cli.main(["query", "--index", str(idx), "--query", "ident_000"])
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert rows and all(set(r) == {"query", "rank", "docID", "score"} for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
