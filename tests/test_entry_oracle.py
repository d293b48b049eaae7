"""Local mirror of the driver's correctness gate: every oracle-backed
query in __spark_entry__ runs on Spark AND DuckDB at sf0.001; row
counts, column names, and order-insensitive values must match exactly.
Rows-only queries are smoke-run.  (SURVEY.md §5.5.)
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    got = _canon(q(spark, SF_DIR).toPandas())
    want = _canon(ddb.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for col in got.columns:
        gv, wv = got[col].tolist(), want[col].tolist()
        assert gv == wv, f"{name}.{col}: first diff at " + str(
            next((i, a, b) for i, (a, b) in enumerate(zip(gv, wv)) if a != b)
        )


@pytest.mark.parametrize(
    "name", [k for k in entrymod.queries() if k not in entrymod.oracle_sql()]
)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # planted near-dups exist at sf0.001
    assert df.columns == ["doc_id", "cluster_id", "group_size"]
