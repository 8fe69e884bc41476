"""CLI entry point — the user-facing way to run the engine.

    python -m hdsp_hive_release_src_spark list
    python -m hdsp_hive_release_src_spark run q1_pricing_summary \
        [--sf-dir /root/testdata/sf0.01] [--limit 20]
    python -m hdsp_hive_release_src_spark explain q5_local_supplier_volume
    python -m hdsp_hive_release_src_spark sql "SELECT count(*) FROM lineitem"
    python -m hdsp_hive_release_src_spark describe lineitem
    python -m hdsp_hive_release_src_spark tables

`sql` registers every table in --sf-dir as a temp view first, so raw
HiveQL/Spark-SQL strings work against the catalog directly. `describe`
and `tables` are the Hive metadata surface (DESCRIBE / SHOW TABLES).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="directory holding the parquet tables",
    )
    ap = argparse.ArgumentParser(prog="hdsp_hive_release_src_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries", parents=[common])
    p_run = sub.add_parser(
        "run", help="run a registered query", parents=[common]
    )
    p_run.add_argument("name")
    p_run.add_argument("--limit", type=int, default=20)
    p_ex = sub.add_parser(
        "explain", help="show a query's physical plan", parents=[common]
    )
    p_ex.add_argument("name")
    p_sql = sub.add_parser(
        "sql", help="run a SQL string over the catalog", parents=[common]
    )
    p_sql.add_argument("query")
    p_sql.add_argument("--limit", type=int, default=20)
    p_desc = sub.add_parser(
        "describe", help="DESCRIBE a catalog table", parents=[common]
    )
    p_desc.add_argument("table")
    sub.add_parser(
        "tables", help="list catalog tables (SHOW TABLES)", parents=[common]
    )
    args = ap.parse_args(argv)

    from hdsp_hive_release_src_spark import registry

    registry.load_all()

    if args.cmd == "list":
        for name in sorted(registry.QUERIES):
            mark = "oracle" if name in registry.ORACLES else "rows-only"
            print(f"{name}  [{mark}]")
        return 0

    from hdsp_hive_release_src_spark.session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd in ("run", "explain"):
        if args.name not in registry.QUERIES:
            print(f"unknown query {args.name!r}; try `list`", file=sys.stderr)
            return 2
        df = registry.QUERIES[args.name](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd in ("sql", "describe", "tables"):
        from hdsp_hive_release_src_spark.catalog import Catalog

        Catalog(spark, args.sf_dir).register_views()
        if args.cmd == "sql":
            spark.sql(args.query).show(args.limit, truncate=False)
        elif args.cmd == "describe":
            spark.sql(f"DESCRIBE TABLE {args.table}").show(
                100, truncate=False
            )
        else:
            spark.sql("SHOW TABLES").show(100, truncate=False)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
