"""CLI entry points — the engine's analog of the reference's scripts
(`python pipeline/clean_historical.py --partitions 4`, `dbt run`):

  python -m earthquake_data_pipeline_spark list
  python -m earthquake_data_pipeline_spark query <name> [--sf-dir D] [--limit N]
  python -m earthquake_data_pipeline_spark pipeline [--warehouse D] [--days N]

`query` runs one catalog query and prints rows; `pipeline` runs the full
model DAG (synthetic ingest → clean → stg → fact → 9 analytics views),
the `dbt run` restatement.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from datetime import date, timedelta


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="earthquake_data_pipeline_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalog queries")

    qp = sub.add_parser("query", help="run one catalog query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--limit", type=int, default=20)
    qp.add_argument("--explain", action="store_true")

    pp = sub.add_parser("pipeline", help="run the full model DAG")
    pp.add_argument("--warehouse", default=None)
    pp.add_argument("--days", type=int, default=31)

    args = parser.parse_args(argv)

    from .driver_queries import QUERIES

    if args.cmd == "list":
        for name in QUERIES:
            print(name)
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"edps-{args.cmd}")

    if args.cmd == "query":
        if args.name not in QUERIES:
            print(f"unknown query {args.name!r} — see `list`", file=sys.stderr)
            return 2
        df = QUERIES[args.name](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        return 0

    # pipeline: synthetic ingest → clean → stg → fact → analytics views
    from pyspark.sql import functions as F

    from .operators.cleaning import clean_events
    from .plans.models import (
        ANALYTICS_MODELS,
        fact_earthquake_data,
        stg_earthquake,
    )
    from .plans.registry import ModelRegistry
    from .sources.usgs import SyntheticFetcher, fetch_to_dataframe

    start = date(2020, 1, 1)
    raw = fetch_to_dataframe(
        spark, SyntheticFetcher(rows_per_day=8), start, start + timedelta(days=args.days)
    )
    warehouse = args.warehouse or tempfile.mkdtemp(prefix="edps-wh-")
    reg = ModelRegistry(spark, warehouse_dir=warehouse)
    reg.source("raw_events", raw)
    reg.model(
        "cleaned",
        lambda df: clean_events(df)
        .withColumn("country", F.lit(None).cast("string"))
        .withColumn("region", F.lit(None).cast("string")),
        ["raw_events"],
        materialization="ephemeral",
    )
    reg.model("stg_earthquake", stg_earthquake, ["cleaned"], materialization="table")
    reg.model(
        "fact_earthquake_data",
        fact_earthquake_data,
        ["stg_earthquake"],
        materialization="table",
    )
    for name, fn in ANALYTICS_MODELS.items():
        reg.model(name, fn, ["fact_earthquake_data"], materialization="view")
    results = reg.run()
    for name, df in results.items():
        print(f"{name}: {df.count()} rows")
    print(f"warehouse: {warehouse}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
