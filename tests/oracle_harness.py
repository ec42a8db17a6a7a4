"""Local twin of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares twice: a tolerant pass (row count,
column names, order-insensitive values with float rounding — catches
logic bugs with readable diffs) and a STRICT pass (exact serialized
values, dtype-class sensitive — the driver's hash has no float
tolerance, and a DuckDB HUGEINT sum rendering as float64 against
Spark's int64 hash-fails even when numerically equal; round 2 lost
nine keys to exactly that). Catching either here at sf0.001 is much
cheaper than waiting for the driver's sf0.01 run.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pubsub2bq_spark.tables import TABLE_NAMES, table_path

FLOAT_DECIMALS = 4


def _cell(v) -> str:
    """Canonical string for one cell — exact, dtype-class sensitive."""
    if v is None:
        return "\0null"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0null"
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    if isinstance(v, pd.Timestamp):
        ts = v
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return f"t:{ts.isoformat()}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_cell(x)}" for k, x in sorted(v.items())) + "}"
    try:
        if pd.isna(v):
            return "\0null"
    except (TypeError, ValueError):
        pass
    if hasattr(v, "item"):  # numpy scalar
        return _cell(v.item())
    return f"s:{v}"


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(_cell(df[c].iloc[i]) for c in cols) for i in range(len(df))]
    rows.sort()
    return rows


def strict_compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str | None:
    """Driver-style exact comparison; returns a description or None."""
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return (
            f"columns spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
    if len(spark_pdf) != len(oracle_pdf):
        return f"rows spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    a, b = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    cols = sorted(spark_pdf.columns)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            detail = "; ".join(
                f"{c}: spark={x} oracle={y}"
                for c, x, y in zip(cols, ra, rb)
                if x != y
            )
            return f"strict diff at sorted-row {i}: {detail}"
    return None


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize values, sort rows — order-insensitive."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(FLOAT_DECIMALS)
        elif pd.api.types.is_datetime64_any_dtype(s):
            ser = s
            if getattr(ser.dtype, "tz", None) is not None:
                ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = ser.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: f"{v:.{FLOAT_DECIMALS}f}" if isinstance(v, float) else v)
    df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()

    strict = strict_compare(spark_pdf, oracle_pdf)
    if strict:
        problems.append(strict)

    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")

    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    if len(a) == len(b):
        for c in a.columns:
            col_a, col_b = a[c], b[c]
            if pd.api.types.is_float_dtype(col_a) or pd.api.types.is_float_dtype(col_b):
                ok = [
                    (pd.isna(x) and pd.isna(y))
                    or (
                        not pd.isna(x)
                        and not pd.isna(y)
                        and math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=10 ** -FLOAT_DECIMALS)
                    )
                    for x, y in zip(col_a, col_b)
                ]
                bad = [i for i, v in enumerate(ok) if not v]
            else:
                eq = (col_a == col_b) | (col_a.isna() & col_b.isna())
                bad = list(eq[~eq].index)
            if bad:
                i = bad[0]
                problems.append(
                    f"value mismatch col={c} rows={len(bad)} first@{i}: "
                    f"spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
                )
    return problems
