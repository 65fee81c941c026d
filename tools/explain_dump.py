"""Dump .explain("formatted") for registered queries to files.

Usage: python tools/explain_dump.py <outdir> [suffix] [names...]
Writes <outdir>/<query>_<suffix>.txt (suffix default "before") for each
named query (default: all 50). The optimization-round judge checks plan
claims against these files, so they are the committed evidence trail.

Also prints a one-line plan summary per query: Exchange count, join
node kinds, Python-eval nodes — the quick triage table for
OPTIMIZATION_r*.md.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from hadoop_2_10_0_src_mapreduce_spark.plans.registry import all_queries
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    todo = names or list(qs)
    for name in todo:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(
            r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)\b", plan)))
        pynodes = sorted(set(re.findall(
            r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
            r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas)\b", plan)))
        sorts = len(re.findall(r"\bSort\b", plan))
        print(f"{name:28s} exch={n_ex:2d} sorts={sorts:2d} "
              f"joins={','.join(joins) or '-'} py={','.join(pynodes) or '-'}")


if __name__ == "__main__":
    main()
