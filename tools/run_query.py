"""Run any registry query from the command line.

Usage:
    python tools/run_query.py <name> [--sf DIR] [--explain] [--oracle] [-n N]

    python tools/run_query.py ngram_top
    python tools/run_query.py q1_pricing_summary --sf /root/testdata/sf0.01
    python tools/run_query.py dedup_minhash --explain      # plan, no execution
    python tools/run_query.py funnel_conversion --oracle   # DuckDB side too

`--list [substr]` prints the catalog (name, headline flag, oracle kind).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_cdc_service_spark.registry import REGISTRY  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", help="registry query name")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--explain", action="store_true", help="print the formatted plan instead of executing")
    ap.add_argument("--oracle", action="store_true", help="also run the DuckDB oracle and print both")
    ap.add_argument("-n", type=int, default=20, help="rows to show")
    ap.add_argument("--list", dest="list_filter", nargs="?", const="", default=None,
                    help="list catalog entries (optionally filtered by substring)")
    args = ap.parse_args()

    if args.list_filter is not None:
        for name, spec in REGISTRY.items():
            if args.list_filter in name:
                kind = "oracle" if spec.oracle else "rows-only"
                star = "*" if spec.headline else " "
                print(f"{star} {name:32s} {kind}")
        return

    if not args.name or args.name not in REGISTRY:
        ap.error(f"unknown query {args.name!r}; try --list")

    from simple_cdc_service_spark.session import get_spark

    spec = REGISTRY[args.name]
    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = spec.fn(spark, args.sf)

    if args.explain:
        df.explain("formatted")
        return

    t0 = time.perf_counter()
    rows = df.collect()
    dt = time.perf_counter() - t0
    print(f"-- {args.name}: {len(rows)} rows in {dt:.2f}s ({args.sf})")
    for r in rows[: args.n]:
        print(r.asDict())
    if len(rows) > args.n:
        print(f"... {len(rows) - args.n} more")

    if args.oracle and spec.oracle:
        import duckdb

        from simple_cdc_service_spark.sources.tables import TABLES

        con = duckdb.connect()
        for t in TABLES:
            p = f"{args.sf}/{t}.parquet"
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        print("-- oracle (DuckDB):")
        print(con.execute(spec.oracle).df().head(args.n).to_string())
    elif args.oracle:
        print("-- no SQL oracle for this entry (rows-only check)")


if __name__ == "__main__":
    main()
