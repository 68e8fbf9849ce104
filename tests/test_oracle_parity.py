"""THE correctness gate: every queries() entry vs its DuckDB oracle.

Local clone of the driver's check: for each query, run the Spark plan
and the oracle SQL on the same parquet tables, then compare row count,
column-name set, and order-insensitive values (floats to near-exact
tolerance). Runs at sf0.001 by default; set TEST_SF_DIR for sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from retail_sales_etl_spark.catalog import TABLES, table_path
from retail_sales_etl_spark.plans import registry

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _normalize_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _sortable(row):
    return tuple(
        (str(type(c).__name__), str(c)) if c is not None else ("", "") for c in row
    )


def _compare_rows(spark_rows, duck_rows, cols):
    assert len(spark_rows) == len(duck_rows), (
        f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_sorted = sorted(spark_rows, key=_sortable)
    d_sorted = sorted(duck_rows, key=_sortable)
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for col, sv, dv in zip(cols, sr, dr):
            # Driver-hash hazard: the engines normalize the sign of a
            # zero differently (Spark round() → +0.0, DuckDB → -0.0),
            # and a -0.0 formats differently from 0.0 in the driver's
            # bit-level value hash even when isclose() passes. No
            # oracle-checked query may emit one from EITHER engine.
            for v, eng in ((sv, "spark"), (dv, "duck")):
                if isinstance(v, float) and v == 0.0:
                    assert math.copysign(1.0, v) > 0, (
                        f"row {i} col {col}: {eng} emitted -0.0 "
                        "(use floor(x*1eN + 0.5)/1eN, not round)"
                    )
            sv, dv = _normalize_cell(sv), _normalize_cell(dv)
            if isinstance(sv, float) and isinstance(dv, (float, int)):
                ok = sv == dv or math.isclose(sv, float(dv), rel_tol=1e-12, abs_tol=1e-9)
            else:
                ok = sv == dv
            assert ok, f"row {i} col {col}: spark={sv!r} duck={dv!r}"


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    cols = sorted(sdf.columns)
    spark_rows = [tuple(r[c] for c in cols) for r in sdf.collect()]

    con = _duck_con(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    raw = res.fetchall()
    assert sorted(duck_cols) == cols, f"columns: spark={cols} duck={sorted(duck_cols)}"
    order = [duck_cols.index(c) for c in cols]
    duck_rows = [tuple(row[i] for i in order) for row in raw]
    _compare_rows(spark_rows, duck_rows, cols)


# DuckDB result type -> acceptable Spark simpleStrings. Any duck type NOT
# in this map (HUGEINT above all: DuckDB types sum(int) as int128 where
# Spark emits bigint — the round-1 hash-FAIL class) fails the gate
# outright, so type drift is caught locally before the driver's
# type-sensitive hash sees it. Int WIDTH differences (int vs bigint) are
# allowed: 12 round-1 queries carried them and hashed green, so the driver
# canonicalizes widths — only the unmapped types break it.
_DUCK_TO_SPARK = {
    "BOOLEAN": {"boolean"},
    "TINYINT": {"tinyint", "smallint", "int", "bigint"},
    "SMALLINT": {"tinyint", "smallint", "int", "bigint"},
    "INTEGER": {"tinyint", "smallint", "int", "bigint"},
    "BIGINT": {"tinyint", "smallint", "int", "bigint"},
    "FLOAT": {"float", "double"},
    "DOUBLE": {"float", "double"},
    "VARCHAR": {"string"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
}


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_types_spark_compatible(spark, sf_dir, name):
    """Schema-only check (no execution): every oracle output column's
    DuckDB type must map to a Spark type the driver hash treats as
    equal to the Spark column's type."""
    sdf = QUERIES[name](spark, sf_dir)
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    con = _duck_con(sf_dir)
    rel = con.sql(ORACLES[name])
    for col, dtype in zip(rel.columns, rel.types):
        d = str(dtype)
        assert d in _DUCK_TO_SPARK, (
            f"{name}.{col}: oracle type {d} has no Spark equivalent — "
            f"cast it in the oracle SQL (sum(int) -> CAST(... AS BIGINT))"
        )
        actual = spark_types[col]
        assert actual in _DUCK_TO_SPARK[d], (
            f"{name}.{col}: oracle {d} incompatible with spark {actual}"
        )


def test_all_queries_have_callables():
    assert QUERIES, "query registry is empty"
    for name in ORACLES:
        assert name in QUERIES, f"oracle {name} has no query implementation"
