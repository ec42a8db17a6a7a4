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
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubsub2bq_spark.registry import all_queries
from pubsub2bq_spark.session import get_spark
from tests.oracle_harness import duckdb_conn


def strict_compare(spark_pdf, oracle_pdf):
    from tests.oracle_harness import strict_compare as _sc

    return _sc(spark_pdf, oracle_pdf)


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
