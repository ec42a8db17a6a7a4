"""Driver-twin preflight: replay the driver's CORRECTNESS pass locally.

Runs `__spark_entry__.queries()` in rotation order on a VANILLA
SparkSession (the driver does not use session.py) from a non-repo cwd,
compares each query against its `oracle_sql()` twin via the
dtype-strict harness, and stops after `--cap` keys (the driver's
per-round budget). This is the closest local approximation of the
gate that grades the round.

Usage:
    python scripts/driver_twin.py [--sf /root/testdata/sf0.01] [--cap 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pubsub2bq_spark.tables import TABLE_NAMES as TABLES  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cap", type=int, default=50)
    ap.add_argument(
        "--keys",
        default=None,
        help="comma-separated registry keys: check only these (cap ignored)",
    )
    args = ap.parse_args()

    os.chdir("/tmp")  # the driver does not run from the repo root

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E
    from tests.oracle_harness import strict_compare

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    q, o = E.queries(), E.oracle_sql()
    if args.keys:
        wanted = [k.strip() for k in args.keys.split(",") if k.strip()]
        missing = [k for k in wanted if k not in q]
        if missing:
            print(f"unknown keys: {missing}")
            return 1
        todo = wanted
    else:
        rows = E.entry(spark).collect()
        print(f"entry smoke: {len(rows)} rows")
        todo = list(q)[: args.cap]

    n_fail = 0
    for i, key in enumerate(todo):
        t0 = time.time()
        try:
            spdf = q[key](spark, args.sf).toPandas()
        except Exception as exc:  # noqa: BLE001 — preflight must not stop
            print(f"FAIL  {key}: spark raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if key not in o:
            print(f"rows  {key}: {len(spdf)} rows (no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        opdf = con.execute(o[key]).df()
        diff = strict_compare(spdf, opdf)
        if diff:
            print(f"FAIL  {key}: {diff}")
            n_fail += 1
        else:
            print(f"ok    {key} ({len(spdf)} rows) [{time.time() - t0:.1f}s]")

    print(f"\n{n_fail} failures / {len(todo)} keys @ {args.sf}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
