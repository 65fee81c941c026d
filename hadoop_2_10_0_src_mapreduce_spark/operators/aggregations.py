"""Aggregations — Reducer/Combiner-library parity (SURVEY.md §2.5).

Reference semantics: shuffle grouping IS the group-by; the Combiner is
map-side partial aggregation. Spark's hash aggregate already splits
partial/final exactly like Combiner/Reducer (with sort-agg spill
fallback matching the reference's sort-based grouping), so everything
here is expression composition — the one genuinely custom piece is
ValueHistogram's two-level statistics.

Parity map (lib/aggregate/*, lib/reduce/* [H]):
- IntSumReducer/LongSumReducer/LongValueSum/DoubleValueSum → sum_by_key
- LongValueMax/Min, StringValueMax/Min                     → minmax_by_key
- UniqValueCount (with maxNumItems cap)                    → uniq_value_count
- ValueHistogram                                           → value_histogram
- WordMean/WordMedian/WordStandardDeviation examples       → word_stats
- ValueAggregatorJob framework ("type:id" → value)         → the
  registry + groupBy().agg(expr-list) IS the declarative framework;
  custom aggregators → pandas_udf GROUPED_AGG (see udf module)
- Counters                                                 → observe_counters
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def sum_by_key(df: DataFrame, keys: Sequence[str], value: str, out: str = "sum") -> DataFrame:
    """LongSumReducer parity. Spark runs this as partial hash agg
    (the Combiner) + final agg after shuffling only the per-key
    partials — identical dataflow, no per-record Java loop."""
    return df.groupBy(*keys).agg(F.sum(value).alias(out))


def minmax_by_key(df: DataFrame, keys: Sequence[str], value: str) -> DataFrame:
    """LongValueMax/Min + StringValueMax/Min parity (min/max work for
    both numeric and lexicographic-string semantics in Spark)."""
    return df.groupBy(*keys).agg(
        F.min(value).alias("min_value"), F.max(value).alias("max_value")
    )


def uniq_value_count(
    df: DataFrame, keys: Sequence[str], value: str, max_items: int | None = None
) -> DataFrame:
    """UniqValueCount parity: distinct values per key, optionally
    capped at ``max_items`` (the reference capped to bound reducer
    memory — emitted min(distinct, cap)).

    Exact countDistinct expands rows by the distinct value before the
    final agg; at extreme cardinality prefer approx_count_distinct
    (HLL — bounded memory like the reference's cap, but principled).
    """
    cnt = F.countDistinct(value)
    if max_items is not None:
        cnt = F.least(cnt, F.lit(max_items))
    return df.groupBy(*keys).agg(cnt.alias("uniq_count"))


def value_histogram(df: DataFrame, keys: Sequence[str], value: str) -> DataFrame:
    """ValueHistogram parity: per key, build value→frequency, then
    summarize the FREQUENCIES: distinct-value count, min/median/max/
    mean/stddev of the per-value counts.

    Two-level aggregation — both levels are hash aggs with partial
    combine, so the wide shuffle carries (key, value) pairs once.
    Median is exact (Spark 4 ``median``), matching the reference's
    sorted-count walk, not percentile_approx.
    """
    freq = df.groupBy(*keys, value).agg(F.count(F.lit(1)).alias("freq"))
    return (
        freq.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("uniq_values"),
            F.min("freq").alias("min_freq"),
            F.max("freq").alias("max_freq"),
            F.round(F.avg("freq"), 6).alias("avg_freq"),
            F.median("freq").alias("median_freq"),
            F.round(F.stddev_pop("freq"), 6).alias("stddev_freq"),
        )
    )


def word_stats(tokens: DataFrame, col: str = "token") -> DataFrame:
    """WordMean/WordMedian/WordStandardDeviation parity, one pass
    (the reference ran three separate jobs over the same input)."""
    length = F.length(F.col(col))
    return tokens.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.avg(length), 6).alias("mean_len"),
        F.median(length).alias("median_len"),
        F.round(F.stddev_pop(length), 6).alias("stddev_len"),
    )


def observe_counters(df: DataFrame, name: str, exprs: dict[str, Column]) -> tuple[DataFrame, Observation]:
    """Counters parity (CORE/mapreduce/counters/* [H]): add-only global
    metrics collected as a side effect of the job, without a second
    pass. ``Observation.get`` after the action ≈ Counters.getGroup()."""
    obs = Observation(name)
    return df.observe(obs, *[e.alias(n) for n, e in exprs.items()]), obs


#: ValueAggregatorDescriptor types → Spark expressions
#: (LongValueSum/DoubleValueSum, LongValueMax/Min, UniqValueCount, ...)
_AGGREGATOR_TYPES = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "count": F.count,
    "uniq": F.countDistinct,
}


def value_aggregator(
    df: DataFrame, keys: Sequence[str], specs: dict[str, str]
) -> DataFrame:
    """ValueAggregatorJob parity (lib/aggregate/* [H]): the reference's
    declarative agg framework dispatched on ``"type:column"`` spec
    strings emitted by mappers; here the same spec shape compiles to an
    agg expression list in one pass (the generic reducer + combiner
    split is Spark's partial/final agg).

        value_aggregator(df, ["k"], {"total": "sum:v", "n_ids": "uniq:id"})

    Unknown types raise with the valid list (the reference deferred to
    a user plug-in class here; ours is `pandas_udf` GROUPED_AGG)."""
    exprs = []
    for out, spec in specs.items():
        typ, _, col = spec.partition(":")
        if typ not in _AGGREGATOR_TYPES or not col:
            raise ValueError(
                f"bad aggregator spec {spec!r}; want 'type:column' with "
                f"type in {sorted(_AGGREGATOR_TYPES)}"
            )
        exprs.append(_AGGREGATOR_TYPES[typ](col).alias(out))
    return df.groupBy(*keys).agg(*exprs)


# --- sketch-based scale variants --------------------------------------
# The exact aggregates above are the oracle-checkable face; these are
# the 100 TB path for the cardinalities where exactness stops being
# affordable: HyperLogLog++ distinct counts (bounded memory per group
# vs countDistinct's expand-by-value), KLL/GK approximate quantiles
# (one pass, no global sort), and frequent-item detection. Accuracy is
# a TUNABLE, so correctness is pinned by tolerance tests against the
# exact twins, not by the value-hash gate.


def approx_uniq_value_count(
    df: DataFrame, keys: Sequence[str], value: str, *, rsd: float = 0.05
) -> DataFrame:
    """uniq_value_count's sketch twin: HyperLogLog++ with relative
    standard deviation ``rsd``. Memory per group is the fixed sketch
    (~kilobytes at 5%), not the distinct-value set — at billions of
    distinct values per key this is the only shape that finishes.
    Partial aggregation merges sketches map-side like any Combiner."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(value, rsd).alias("approx_uniq_count")
    )


def approx_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    *,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-key approximate quantiles (percentile_approx, Greenwald-
    Khanna style): one pass, mergeable partial sketches, error bounded
    by 1/accuracy of the rank — the scale path where value_histogram's
    exact median (a full sort of per-value counts) would dominate the
    job. Returns one column per requested probability."""
    pcol = F.percentile_approx(
        value, F.array(*[F.lit(float(p)) for p in probs]), accuracy
    )
    sel = [
        F.col("_q")[i].alias(f"q{str(p).replace('.', '_')}")
        for i, p in enumerate(probs)
    ]
    return df.groupBy(*keys).agg(pcol.alias("_q")).select(*keys, *sel)


def frequent_values(
    df: DataFrame, keys: Sequence[str], value: str, *, min_share: float = 0.1
) -> DataFrame:
    """Values holding at least ``min_share`` of their key's rows — the
    skew/hot-key detector (the operational companion to _df_capped and
    the salted join: find the keys that NEED those guards). Exact and
    cheap: one (key, value) count plus a per-key total that rides the
    same shuffled exchange as a window aggregate."""
    from pyspark.sql.window import Window

    counted = df.groupBy(*keys, value).agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy(*keys))
    return (
        counted.withColumn("share", F.round(F.col("cnt") / total, 6))
        .where(F.col("share") >= min_share)
        .select(*keys, value, "cnt", "share")
    )
