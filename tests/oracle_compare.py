"""Order-insensitive result comparison between Spark and DuckDB results.

Mirrors the driver's t2 check: row count + column names + value hash over
column-name-sorted, row-sorted canonical values. Floats are canonicalized
via repr of float64; timestamps via ISO microseconds; NULL as a literal.
"""

from __future__ import annotations

import math

import pandas as pd


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in pdf.astype(object).where(pdf.notna(), None).iterrows()
    ]
    return sorted(rows)


def assert_results_match(spark_df, duck_pdf: pd.DataFrame, name: str = "") -> None:
    spark_pdf = spark_df.toPandas()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diffs = [
            (i, s, d) for i, (s, d) in enumerate(zip(s_rows, d_rows)) if s != d
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
