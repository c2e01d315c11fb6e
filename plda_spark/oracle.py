"""Cross-engine result comparison (Spark vs DuckDB oracle).

The driver's correctness gate sorts columns by name, canonicalizes
values, and hash-compares order-insensitively.  This module reproduces
that comparison so the pytest extras gate (tests/test_extra_oracle.py)
and tools/check_oracle.py apply the identical standard to queries the
driver's 50-slot cap cannot record.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["canon", "compare_frames", "duckdb_connection"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, values stringified, rows sorted — the
    order-insensitive canonical form both engines are reduced to."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]

        def conv(v):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return "NULL"
            if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
                return "NULL"
            if isinstance(v, float):
                return repr(v)
            return str(v)

        out[c] = s.map(conv)
    cdf = pd.DataFrame(out)
    return cdf.sort_values(by=list(cdf.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare_frames(sdf: pd.DataFrame, ddf: pd.DataFrame) -> str | None:
    """None if the canonical forms match, else a short diff description."""
    a, b = canon(sdf), canon(ddf)
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} vs {len(b)}"
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        head = pd.concat([a[neq].head(3), b[neq].head(3)], keys=["spark", "duckdb"])
        return f"{int(neq.sum())}/{len(a)} rows differ; first diffs:\n{head}"
    return None


def duckdb_connection(sf_dir: str):
    """A DuckDB connection with every test table registered as a view."""
    import duckdb

    from plda_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con
