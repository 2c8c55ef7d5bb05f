"""Driver-contract simulation: every queries() entry runs at sf0.01; those
with an oracle_sql() entry must match DuckDB row-for-row (order-insensitive,
columns sorted by name — the driver's comparison)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    v = None
                else:
                    v = round(v, 6)
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, bool):
                v = int(v)
            row.append(v)
        rows.append(tuple(row))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    mine = q(spark, SF_DIR).toPandas()
    ref = duck.execute(sql).fetchdf()
    assert sorted(c.lower() for c in mine.columns) == \
        sorted(c.lower() for c in ref.columns), f"{name}: schema mismatch"
    a, b = _norm(mine), _norm(ref)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, f"{name}: first mismatches {[(a[i], b[i]) for i in mism[:3]]}"


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name, fn in qs.items():
        if name in oracles:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"node_id", "cluster_id", "cluster_size"}


def test_entry_on_vanilla_session():
    """The driver builds its own SparkSession; entry() must not depend on
    our session tuning (Arrow flags, checkpoint dir, AQE settings). Runs in
    a subprocess — getOrCreate in-process would reuse (and stop() would
    kill) the suite's shared session."""
    import subprocess
    import sys

    script = (
        "from pyspark.sql import SparkSession\n"
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import __spark_entry__ as m\n"
        "spark = (SparkSession.builder.master('local[2]')"
        ".config('spark.ui.enabled','false').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "print('VANILLA_ROWS', m.entry(spark).count())\n"
    )
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=600)
    assert "VANILLA_ROWS" in out.stdout, out.stderr[-2000:]
    assert int(out.stdout.split("VANILLA_ROWS")[1].split()[0]) > 0
