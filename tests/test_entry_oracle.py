"""Mirror of the driver's correctness gate: run every queries() entry
and its oracle_sql() through DuckDB on the same parquet, compare
row-count, column names, and exact values (order-insensitive)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df):
    """pandas DF → sorted list of tuples over name-sorted columns with
    canonicalized cell values (the driver hashes equivalently)."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif isinstance(v, float):
                vals.append(round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, out


ORACLES = sorted(entry_mod.oracle_sql())

# Queries whose oracle is a GOLDEN built from a specific SF's
# documents table (not recomputable by DuckDB at arbitrary SF): pin
# the Spark side to that SF. The driver's gate runs at sf0.01, so
# this mirrors it exactly; replica equality at other inputs is
# covered by tests/test_bpe.py.
GOLDEN_SF = {"bpe_train": "/root/testdata/sf0.01",
             "bpe_encode": "/root/testdata/sf0.01",
             "unigram_train": "/root/testdata/sf0.01",
             "unigram_encode": "/root/testdata/sf0.01",
             "extract_main_text": "/root/testdata/sf0.01",
             # goldens built from the sf0.01 embeddings (numpy
             # replica); replica equality at sf0.001 is covered by
             # tests/test_ivfpq.py
             "ann_ivfpq": "/root/testdata/sf0.01",
             "ann_ivfpq_refined": "/root/testdata/sf0.01",
             # goldens from the sf0.01 embeddings via oracle/ivf_ref
             # (trained Lloyd loop + prod serving); replica equality
             # on other inputs: tests/test_ann_training.py
             "ann_ivf_trained": "/root/testdata/sf0.01",
             "ann_ivf_prod": "/root/testdata/sf0.01"}


@pytest.mark.parametrize("name", ORACLES)
def test_query_vs_oracle(name, spark):
    q = entry_mod.queries()[name]
    spark_pdf = q(spark, GOLDEN_SF.get(name, SF_DIR)).toPandas()
    con = _duck()
    duck_pdf = con.sql(entry_mod.oracle_sql()[name]).df()
    s_cols, s_rows = _normalize(spark_pdf)
    d_cols, d_rows = _normalize(duck_pdf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()) - {"crawl_trace"})


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
