"""CLI — ToolRunner/GenericOptionsParser parity (SURVEY.md §2.8;
COMMON/util/ToolRunner.java, GenericOptionsParser [H]).

The reference's job drivers all follow one CLI convention:
``hadoop jar app.jar JobName -D key=value ... input output``. This is
that convention over the query catalog:

    python -m hadoop_2_10_0_src_mapreduce_spark list
    python -m hadoop_2_10_0_src_mapreduce_spark run wordcount_grep \
        --sf-dir /root/testdata/sf0.001 -D spark.sql.shuffle.partitions=8 \
        [--output /path/parquet] [--limit 20]

``-D`` passes any Spark conf straight through (ToolRunner's
Configuration overrides); without ``--output`` the result prints like
the reference's console jobs, with it the result lands in parquet.
"""

from __future__ import annotations

import argparse
import sys


def _conf_pairs(pairs: list[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"-D expects key=value, got: {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hadoop_2_10_0_src_mapreduce_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run one registered query")
    run.add_argument("query")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    run.add_argument("-D", dest="conf", action="append", default=[],
                     metavar="key=value", help="Spark conf override")
    run.add_argument("--output", help="write result parquet here instead of printing")
    run.add_argument("--limit", type=int, default=20, help="rows to print")
    run.add_argument("--explain", action="store_true",
                     help="print the formatted physical plan instead of executing")

    args = ap.parse_args(argv)

    from hadoop_2_10_0_src_mapreduce_spark.plans.registry import REGISTRY, all_queries

    qs = all_queries()
    if args.cmd == "list":
        for name in sorted(qs):
            print(f"{name}\t{REGISTRY[name].doc}")
        return 0

    if args.query not in qs:
        print(f"unknown query: {args.query} (try 'list')", file=sys.stderr)
        return 2

    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    spark = get_spark(f"cli:{args.query}", extra_conf=_conf_pairs(args.conf))
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[args.query](spark, args.sf_dir)
    if args.explain:
        # the plan-inspection loop the engine is tuned with: check for
        # PushedFilters / ReadSchema pruning / broadcast vs shuffle
        # joins / WholeStageCodegen spans before running at scale
        df.explain("formatted")
    elif args.output:
        df.write.mode("error").parquet(args.output)
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
