"""Driver-style Spark-vs-DuckDB comparison harness (shared by tests)."""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import duckdb
import pandas as pd


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # kill -0.0 and float repr jitter beyond what queries round away
        return round(v + 0.0, 9)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return bool(v)
    return v


def normalize(df: pd.DataFrame) -> Tuple[Tuple[str, ...], list]:
    """Sorted column names + order-insensitive multiset of row tuples —
    mirrors the driver's row-count + schema + value-hash compare."""
    cols = tuple(sorted(df.columns))
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[list(cols)].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> Optional[str]:
    """None if equal; otherwise a human-readable diff summary."""
    sc, sr = normalize(spark_pdf)
    dc, dr = normalize(duck_pdf)
    if sc != dc:
        return f"schema mismatch: spark={sc} duckdb={dc}"
    if len(sr) != len(dr):
        return f"row count mismatch: spark={len(sr)} duckdb={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            return f"value mismatch at sorted row {i}: spark={a} duckdb={b}"
    return None
