"""Plan linter — the engine's scale audit as a user-facing API.

The test suite asserts an executable no-scale-killer invariant over
every registered query (tests/test_scale_strategies.py); this module
packages the same judgment for USER plans, so "would this survive
100×?" is a function call instead of a code review:

    from hadoop_2_10_0_src_mapreduce_spark.plans.lint import lint_plan
    for finding in lint_plan(df):
        print(finding)

Findings are strings prefixed with a severity tag. The linter reads
the analyzed/physical plan only — it never executes the query — so it
is safe to run on arbitrarily expensive frames before committing to
them. CLI: ``python -m hadoop_2_10_0_src_mapreduce_spark run <query>
--lint``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# (marker in the physical plan, severity, what it means / what to do)
_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "BatchEvalPython",
        "FATAL",
        "row-at-a-time Python UDF on the row path — every row crosses "
        "the JVM/Python boundary individually (~10-100x slower than "
        "Arrow). Rewrite with built-in pyspark.sql.functions, or batch "
        "it: pandas_udf / mapInPandas / applyInPandas.",
    ),
    (
        "CartesianProduct",
        "FATAL",
        "cartesian product — O(|left|*|right|) rows. Unless this IS the "
        "cross join you wanted, a join condition failed to reach the "
        "planner (check for non-equi predicates or column ambiguity).",
    ),
    (
        "BroadcastNestedLoopJoin",
        "WARN",
        "nested-loop join — no equi-condition, so every (probe row, "
        "build row) pair is compared. Fine for a one-row/scalar build "
        "side; for point-in-interval use a binned equi decomposition "
        "(operators.joins.range_join), for as-of use asof_join.",
    ),
    (
        "InMemoryTableScan",
        "INFO",
        "reads a cached/persisted frame — expected inside the engine's "
        "pair generators; in a long-lived session remember the caching "
        "contract (spark.catalog.clearCache() at batch boundaries).",
    ),
)


# Inputs estimated above this get a WARN when an all-pairs dedup runs
# without a bucket cap. Calibrated against the repo's own decade data:
# the 500k-doc corpus (~95 MiB parquet) with one 20k-doc boilerplate
# cluster owed C(20k,2) ≈ 200M candidates per band uncapped
# (fixtures/DEDUP_DECADE_baseline.jsonl: 1009 s); the sf0.01/sf0.1
# driver inputs (<10 MiB) stay silent.
ALLPAIRS_GUARD_BYTES = 32 * 1024 * 1024


def unguarded_allpairs_finding(df: DataFrame, op: str) -> str | None:
    """Lint rule for the quadratic class the r8 decade check caught:
    ``op`` (an LSH-bucketed pair generator) is about to run with
    ``max_bucket=None`` — exact all-pairs in-bucket candidates — over
    ``df``. If Catalyst's size estimate for ``df`` exceeds
    ``ALLPAIRS_GUARD_BYTES``, return a WARN string (None otherwise):
    at that scale one boilerplate mega-cluster of m near-identical
    docs owes C(m,2) candidates per band, and web corpora always have
    one. The pair generators call this themselves and surface it via
    ``warnings.warn``; it is exposed here so user plans get the same
    audit the engine applies to its own.

    Static: reads optimizer statistics only, never executes ``df``.
    The estimate is conservative for non-file inputs (joins multiply
    stats), which errs toward warning — the cheap direction, since the
    fix (``max_bucket=64``) is clustering-identity-preserving."""
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None
    if size < ALLPAIRS_GUARD_BYTES:
        return None
    # Catalyst's unknown-size sentinel (2^63-ish on joins without
    # stats) is still worth the warning — the conservative direction —
    # but printing it as MiB reads as garbage
    shown = (
        "unknown (no statistics)" if size >= 1 << 50
        else f"~{size >> 20} MiB"
    )
    return (
        f"WARN: unguarded-all-pairs: {op}(max_bucket=None) over a "
        f"{shown} input — one oversized LSH bucket (a "
        "boilerplate mega-cluster) makes candidate generation "
        "quadratic in the cluster size (measured: 200M candidates / "
        "1009 s for one 20k-doc cluster at 500k docs). Pass "
        "max_bucket (e.g. 64): oversized buckets emit "
        "connectivity-preserving linked edges and "
        "duplicate_components is unchanged."
    )


def lint_plan(df: DataFrame) -> list[str]:
    """Inspect ``df``'s physical plan (without executing it) and return
    scale findings, worst first. Empty list = nothing flagged.

    Checks, in order of severity:

    - FATAL  row-wise Python UDFs (BatchEvalPython) and cartesian
             products;
    - WARN   nested-loop joins and full-scan parquet reads under a
             selective-looking filter (a Filter node directly above a
             scan whose PushedFilters is empty — the predicate never
             reached the reader);
    - INFO   cached-frame reads (a reminder, not a problem).

    The linter is a static read of the SAME markers the repo's
    executable no-scale-killer test pins for every registered query;
    it exists so user-composed plans get the identical audit."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    findings: list[str] = []
    for marker, sev, advice in _RULES:
        if marker in plan:
            findings.append(f"{sev}: {marker}: {advice}")
    # filter-above-scan with nothing pushed: the predicate missed the
    # reader (common causes: a UDF in the predicate, a cast mismatch,
    # or a non-deterministic expression)
    scans = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    if "Filter (" in plan or "+- Filter" in plan:
        if scans and all(not s.strip() for s in scans):
            findings.append(
                "WARN: unpushed-filter: the plan filters rows above a "
                "scan whose PushedFilters is empty — the predicate "
                "never reached the parquet reader (UDFs, casts on the "
                "column side, or non-deterministic expressions block "
                "pushdown). At 100 TB this is the difference between "
                "reading a slice and reading everything."
            )
    order = {"FATAL": 0, "WARN": 1, "INFO": 2}
    findings.sort(key=lambda f: order.get(f.split(":", 1)[0], 9))
    return findings
