"""Shared canonicalization for the Spark-vs-DuckDB parity contract.

ONE implementation consumed by tests/test_oracle_parity.py and
jobs/rehearse_oracles.py so the comparison semantics (float precision,
NULL handling, the registered table list) cannot drift between the
pytest mirror and the rehearsal job.

Precision note: canonicalization is PER COLUMN, not per row —
``DataFrame.iterrows`` materializes each row as a single-dtype Series,
which upcasts BIGINT columns to float64 whenever any DOUBLE column is
present in the same row and silently truncates integers above 2^53
(a ~2^60 kth_hash would compare equal across a ±127 divergence).
Column-wise iteration preserves the integer dtype end-to-end.
"""

import math

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def duck_connect(sf_dir: str):
    """A DuckDB connection with the standard table views registered."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _cell(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    if v is None:
        return "NULL"
    return str(v)


def canon(df):
    """Order-insensitive canonical form: sorted columns, sorted rows,
    floats normalized to 6 decimals, integers exact."""
    cols = sorted(df.columns)
    columns = [[_cell(v) for v in df[c].tolist()] for c in cols]
    rows = sorted(zip(*columns)) if columns else []
    return cols, rows
