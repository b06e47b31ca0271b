"""Mimics the driver's correctness gate: run every queries() entry on
Spark AND its oracle_sql() on DuckDB over the same parquet tables,
compare row count + sorted column names + order-insensitive values."""

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _canon(df):
    """Order-insensitive canonical form: sorted columns, sorted rows,
    floats normalized."""
    cols = sorted(df.columns)
    rows = []
    for _, r in df[cols].iterrows():
        row = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(f"{v:.6f}")
            elif v is None:
                row.append("NULL")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return cols, sorted(rows)


def _pairs():
    import __spark_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    return [(name, fn, os_.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, name, fn, sql):
    sdf = fn(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(sdf) >= 0  # rows-only contract (non-SQL-expressible)
        return
    ddf = _duck(sql)
    scols, srows = _canon(sdf)
    dcols, drows = _canon(ddf)
    assert scols == dcols, f"{name}: columns {scols} != {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: rows {len(srows)} != {len(drows)}"
    )
    mism = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows, first: "
        f"{srows[mism[0]]} != {drows[mism[0]]}"
    )
