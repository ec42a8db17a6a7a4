"""Strict (driver-style) Spark-vs-DuckDB parity sweep.

The driver's CORRECTNESS gate hashes the two result sets exactly — no
float tolerance, and an int64 column that comes back float64 (DuckDB
integer ``sum()`` returns HUGEINT, which pandas renders as float64)
hashes differently even when every value is numerically equal. The
local harness in tests/oracle_harness.py is tolerant by design; this
script is the strict twin used to find the bug class *before* the
driver does.

Usage:
    python scripts/strict_parity.py [--sf /root/testdata/sf0.01] [key ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubsub2bq_spark.registry import all_queries
from pubsub2bq_spark.session import get_spark
from tests.oracle_harness import duckdb_conn


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
    if isinstance(v, (int,)):
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
    # pandas NA / NaT
    try:
        if pd.isna(v):
            return "\0null"
    except (TypeError, ValueError):
        pass
    # numpy scalar ints/floats
    if hasattr(v, "item"):
        return _cell(v.item())
    return f"s:{v}"


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_cell(df[c].iloc[i]) for c in cols) for i in range(len(df))
    ]
    rows.sort()
    return rows


def strict_compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str | None:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return f"columns spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    if len(spark_pdf) != len(oracle_pdf):
        return f"rows spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    a, b = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    cols = sorted(spark_pdf.columns)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            detail = "; ".join(
                f"{c}: spark={x} oracle={y}" for c, x, y in zip(cols, ra, rb) if x != y
            )
            return f"first diff at sorted-row {i}: {detail}"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    reg = all_queries()
    keys = args.keys or [k for k in sorted(reg) if reg[k].oracle is not None]

    spark = get_spark("strict_parity")
    con = duckdb_conn(args.sf)

    n_fail = 0
    for key in keys:
        q = reg[key]
        if q.oracle is None:
            print(f"SKIP  {key} (no oracle)")
            continue
        try:
            spark_pdf = q.spark(spark, args.sf).toPandas()
            oracle_pdf = con.execute(q.oracle).df()
            diff = strict_compare(spark_pdf, oracle_pdf)
        except Exception as exc:  # noqa: BLE001
            diff = f"ERROR {type(exc).__name__}: {exc}"
        if diff:
            n_fail += 1
            print(f"FAIL  {key}: {diff[:500]}")
        else:
            print(f"ok    {key}")
    print(f"\n{n_fail} strict failures / {len(keys)} keys @ {args.sf}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
