"""Mimics the driver's verify: run each queries() entry on Spark and its
oracle_sql() on DuckDB over the same parquet tables; compare row count,
column names, and order-insensitive values — exactly the CORRECTNESS gate.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the IVF oracle embeds a model recomputed from the oracle tables — point
# it at the SAME sf dir this contract test runs the Spark queries on
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = os.environ.get(
    "SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001"
)

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    ddf = con.execute(ORACLES[name]).fetchdf()

    assert sorted(sdf.columns) == sorted(
        ddf.columns
    ), f"{name}: column mismatch {list(sdf.columns)} vs {list(ddf.columns)}"
    assert len(sdf) == len(ddf), f"{name}: rows {len(sdf)} vs {len(ddf)}"

    cols = sorted(sdf.columns)
    srows = sorted(
        tuple(_norm(v) for v in row) for row in sdf[cols].itertuples(index=False)
    )
    drows = sorted(
        tuple(_norm(v) for v in row) for row in ddf[cols].itertuples(index=False)
    )
    mism = [
        (a, b) for a, b in zip(srows, drows) if a != b
    ]
    assert not mism, f"{name}: first value mismatches {mism[:3]}"


def test_all_queries_run_rows_only(spark, sf_dir):
    """Entries without an oracle still must run and return a DataFrame."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"seq", "uri", "depth", "round"}
