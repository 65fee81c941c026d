"""Joins (SURVEY.md §2.4).

The reference's three join strategies map onto Spark's three physical
joins, chosen by Catalyst/AQE instead of by hand:

- reduce-side shuffle join (DATAJOIN tag+cross-product) → shuffle
  hash / sort-merge join
- map-side merge join on pre-sorted co-partitioned inputs
  (CompositeInputFormat, lib/join/*) → sort-merge join; bucketed
  tables make the "pre-sorted, identically partitioned" precondition
  durable exactly like CompositeInputFormat required
- map-side hash join of a DistributedCache'd small table → broadcast
  hash join (automatic under autoBroadcastJoinThreshold; explicit via
  ``broadcast()``)

Semi/anti/theta/as-of joins were absent in the reference (hand-rolled
idioms) — free upgrades here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    *,
    broadcast_right: bool = False,
) -> DataFrame:
    """The general equi-join. ``broadcast_right`` forces the
    DistributedCache pattern for dims you know are small; otherwise
    AQE decides at runtime from actual sizes."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def multiway_inner(
    base: DataFrame, *others: tuple[DataFrame, str | Column, bool]
) -> DataFrame:
    """InnerJoinRecordReader parity: k-way equi inner join. Each other
    is (df, on, broadcast). Catalyst reorders/fuses; with AQE the
    small dims collapse to broadcast stages."""
    out = base
    for df, on, bc in others:
        out = equi_join(out, df, on, "inner", broadcast_right=bc)
    return out


def override_join(
    sources: Sequence[DataFrame], key: str, value: str
) -> DataFrame:
    """OverrideRecordReader / ``override(...)`` parity: k sources of
    (key, value); for duplicate keys the value from the RIGHTMOST
    source wins (prioritized lookup).

    Implementation: successive full-outer joins + coalesce(right,
    left) — one shuffle per source, same as the reference's one merged
    scan but without the pre-sorted precondition. (lib/join/
    OverrideRecordReader.java [H])
    """
    out = sources[0].select(F.col(key), F.col(value))
    for i, src in enumerate(sources[1:], 1):
        r = src.select(F.col(key).alias(f"_k{i}"), F.col(value).alias(f"_v{i}"))
        out = (
            out.join(r, F.col(key) == F.col(f"_k{i}"), "full_outer")
            .select(
                F.coalesce(F.col(key), F.col(f"_k{i}")).alias(key),
                F.coalesce(F.col(f"_v{i}"), F.col(value)).alias(value),
            )
        )
    return out


def semi_join(left: DataFrame, right: DataFrame, on: str | Column) -> DataFrame:
    """left_semi — the reference hand-rolled this as reduce-side tag
    checks; Spark never materializes right columns at all."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Column) -> DataFrame:
    return left.join(right, on, "left_anti")


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cartesian (reference idiom: constant key → single group). Only
    sane when one side is tiny; Spark broadcasts the small side
    (BroadcastNestedLoopJoin)."""
    return left.crossJoin(right)


#: Per-partition hash-build budget for salted_join's SHUFFLE_HASH hint:
#: above this estimated build size the hint is omitted (sort-merge
#: spills; an in-memory hash build OOMs). ~half a conventional
#: per-task execution-memory budget — order-of-magnitude gate only,
#: since plan-time size estimates are coarse.
SHUFFLE_HASH_MAX_BUILD_BYTES = 128 << 20


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: split each hot key's left rows across
    ``salt_buckets`` shuffle partitions by salting, replicate the right
    side once per bucket, join on (keys + salt), drop the salt.

    This is the classic manual remedy for the reference's single-hot-
    reducer pathology (one key → one reduce task); AQE's skew-join
    splitting (on by default, session.SCALE_DEFAULTS) handles most
    cases automatically — reach for this only when a join is both
    skewed AND too large for AQE's post-shuffle splitting, e.g. a
    power-law key joining a mid-size dimension.

    The salt is a deterministic hash of the whole left row, so results
    are reproducible run-to-run. Only inner/left joins make sense here
    (right rows are replicated; a right/full join would duplicate
    right-side non-matches).

    The replicated side carries a SHUFFLE_HASH hint (guide §3.1 —
    pick the strategy deliberately): auto-planning broadcasts it when
    it looks small, which is upside-down for this operator twice over
    — broadcast bytes are salt_buckets× the dimension (the precondition
    for salting is a dimension too big to broadcast comfortably), and
    a broadcast join has no skew for the salt to fix. Hash (not
    sort-merge) because the replicated side partitions are
    deliberately small per (key, salt). Measured at sf0.1:
    BroadcastHashJoin 1.9–2.5 s → ShuffledHashJoin 0.8–1.0 s
    steady-state; result hash-identical (the oracle is the PLAIN
    join).

    The hint is GATED on the replicated side's estimated size (r12
    advice): a shuffled-hash build must hold one partition's rows in
    memory, so when ``dimension_bytes × salt_buckets ÷
    shuffle.partitions`` exceeds ``shuffle_hash_max_build_bytes`` the
    hint is omitted and the planner falls back to sort-merge, which
    spills gracefully. The estimate is Catalyst's plan-time statistic
    (no job); the threshold is deliberately half the conventional
    per-task execution-memory budget."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    l_salted = left.withColumn("_salt", salt)
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    from hadoop_2_10_0_src_mapreduce_spark.sources.readers import (
        estimated_plan_bytes,
    )

    spark = right.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    est_build = estimated_plan_bytes(right) * salt_buckets / max(1, n_shuffle)
    if est_build <= SHUFFLE_HASH_MAX_BUILD_BYTES:
        r_replicated = r_replicated.hint("SHUFFLE_HASH")
    return l_salted.join(r_replicated, keys + ["_salt"], how).drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
) -> DataFrame:
    """As-of join: each left row picks the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within its key group (the time-series
    lookup the reference had no primitive for — SURVEY §2.4).

    Implemented as the union-merge pattern: tag and union both inputs,
    one shuffle on the keys, then a single ``last(..., ignorenulls)``
    over a (ts, tag)-ordered running window carries the latest right
    row's payload forward onto each left row. The whole right payload
    travels as ONE struct, so every output column comes from the SAME
    matched right row — per-column carries would backfill a NULL field
    from an older right row, silently mixing rows. Right rows sort
    before left rows at equal timestamps, so ties match (ASOF's ≤).
    Scales like a sort-merge join: one shuffle + one partition-local
    sort, no range-explosion. Right (key, ts) pairs should be unique —
    pre-aggregate duplicates or the carried payload is pick-of-equals.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left/inner, got {how!r}")
    from pyspark.sql.types import StructType
    from pyspark.sql.window import Window

    keys = list(on)
    lcols = [c for c in left.columns if c not in keys + [left_ts]]
    rpayload = [c for c in right.columns if c not in keys + [right_ts]]
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    if rpayload:
        rstruct_type = StructType(
            [f for f in right.schema.fields if f.name in rpayload]
        )
        rpay_col = F.struct(*rpayload)
    else:  # payload-less right side still needs a match marker
        rstruct_type = "int"
        rpay_col = F.lit(1)
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_tag"),
        *lcols,
        F.lit(None).cast(rstruct_type).alias("_rpay"),
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        rpay_col.alias("_rpay"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ats", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).withColumn(
        "_m", F.last("_rpay", ignorenulls=True).over(w)
    )
    out = filled.where(F.col("_tag") == 1)
    if how == "inner":
        out = out.where(F.col("_m").isNotNull())
    return out.select(
        *keys,
        F.col("_ats").alias(left_ts),
        *lcols,
        *[F.col("_m")[c].alias(c) for c in rpayload],
    )


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    *,
    bin_width: float,
    closed: str = "left",
) -> DataFrame:
    """Interval/range join: every fact row paired with every interval
    row whose [lo, hi) contains its point (``closed="both"`` for
    [lo, hi]) — the point-in-interval lookup (IP→block, ts→validity
    window, value→band) the reference expressed as a reduce-side
    tag-and-sweep (SURVEY §2.4) and naive SQL expresses as a non-equi
    theta join.

    Scale shape — the reason this exists: Catalyst plans a bare
    ``p BETWEEN lo AND hi`` predicate as BroadcastNestedLoop (or a
    cartesian at worst): O(|facts|·|intervals|) comparisons and a
    broadcast-or-bust memory profile. This implementation BINS the
    range dimension instead: each fact hashes to exactly one bin
    (floor(point/bin_width)); each interval replicates across the bins
    it overlaps; the join is then a plain EQUI join on the bin key —
    shuffle-partitioned, AQE-planned, skew-splittable like any other —
    with the exact predicate as a cheap post-filter. A (fact, interval)
    match meets in exactly one bin (the fact's), so no dedup is needed
    and results are exactly the theta join's. Interval replication cost
    is Σ⌈len/bin_width⌉ rows of (lo, hi, payload): pick ``bin_width``
    near the median interval length so typical intervals land in 1–2
    bins. Degenerate empty intervals (lo > hi, or lo ≥ hi under
    half-open) match nothing and are dropped before the explode —
    Spark's ``sequence`` would otherwise count DOWNWARD for them and
    fabricate bins.
    """
    if closed not in ("left", "both"):
        raise ValueError(f"range_join closed must be left|both, got {closed!r}")
    if not bin_width > 0:
        raise ValueError(f"range_join bin_width must be > 0, got {bin_width!r}")
    point = F.col(point_col)
    lo, hi = F.col(lo_col), F.col(hi_col)
    upper_ok = point <= hi if closed == "both" else point < hi
    nonempty = lo <= hi if closed == "both" else lo < hi
    fb = facts.withColumn("_bin", F.floor(point / F.lit(bin_width)))
    ib = intervals.where(nonempty).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(lo / F.lit(bin_width)), F.floor(hi / F.lit(bin_width))
            )
        ),
    )
    return (
        fb.join(ib, "_bin")
        .where((point >= lo) & upper_ok)
        .drop("_bin")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    *,
    bin_width: float,
    closed: str = "left",
    max_bins_per_row: int = 10_000,
) -> DataFrame:
    """Interval–INTERVAL overlap join — the two-sided generalization of
    ``range_join``: every left row paired with every right row whose
    [r_lo, r_hi) overlaps its [l_lo, l_hi) (``closed="both"`` for
    closed intervals on both ends). The session-vs-session /
    validity-window-vs-outage shape naive SQL writes as
    ``a.lo < b.hi AND b.lo < a.hi`` — which Catalyst can only plan
    nested-loop.

    Scale shape: BOTH sides explode across the bins their interval
    overlaps and meet in a plain equi join on the bin key — but unlike
    the point case, an overlapping pair shares up to
    ⌈overlap_len/bin_width⌉ bins, so matching in every shared bin
    would duplicate pairs and force a distinct (a full shuffle of the
    output). Instead each pair is claimed in exactly ONE bin — the bin
    of ``greatest(l_lo, r_lo)``, the overlap's start, which both
    replication ranges provably cover whenever the overlap is
    non-empty — making the equality with that bin a pure post-filter:
    no dedup, no extra exchange, output exactly the theta join's.
    Replication cost is Σ⌈len/bin_width⌉ per side; pick ``bin_width``
    near the median interval length. ``max_bins_per_row`` (default
    10k) guards the mis-sized case: one interval much wider than
    ``bin_width`` silently multiplies row counts and can overrun
    Spark's sequence length limit with an opaque executor error — past
    the cap the job fails fast with the offending span and the knob to
    turn. Degenerate intervals (empty under the chosen closure) are
    dropped before the explode on both sides. The two frames' column
    names must be disjoint (the join carries both payloads)."""
    if closed not in ("left", "both"):
        raise ValueError(f"interval_join closed must be left|both, got {closed!r}")
    if not bin_width > 0:
        raise ValueError(f"interval_join bin_width must be > 0, got {bin_width!r}")
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(
            f"interval_join requires disjoint column names; shared: {sorted(dup)}"
        )
    llo, lhi = F.col(l_lo), F.col(l_hi)
    rlo, rhi = F.col(r_lo), F.col(r_hi)
    if closed == "both":
        l_nonempty, r_nonempty = llo <= lhi, rlo <= rhi
        overlap = (llo <= rhi) & (rlo <= lhi)
    else:
        l_nonempty, r_nonempty = llo < lhi, rlo < rhi
        overlap = (llo < rhi) & (rlo < lhi)

    if not max_bins_per_row > 0:
        raise ValueError(
            f"interval_join max_bins_per_row must be > 0, got {max_bins_per_row!r}"
        )

    def _binned(df, lo, hi, nonempty):
        lo_b, hi_b = F.floor(lo / F.lit(bin_width)), F.floor(hi / F.lit(bin_width))
        # fail fast on a mis-sized bin_width: the raise_error branch
        # feeds the explode input, so it cannot be pruned away, and the
        # per-row cost is one comparison
        seq = F.when(
            hi_b - lo_b < F.lit(max_bins_per_row), F.sequence(lo_b, hi_b)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("interval_join: an interval spans "),
                    (hi_b - lo_b + 1).cast("string"),
                    F.lit(
                        f" bins (>= max_bins_per_row={max_bins_per_row}): "
                        f"bin_width={bin_width} is far below this interval's "
                        "length — pick bin_width near the median interval "
                        "length, or raise max_bins_per_row if the "
                        "replication cost is intended"
                    ),
                )
            )
        )
        return df.where(nonempty).withColumn("_bin", F.explode(seq))

    start_bin = F.floor(F.greatest(llo, rlo) / F.lit(bin_width))
    return (
        _binned(left, llo, lhi, l_nonempty)
        .join(_binned(right, rlo, rhi, r_nonempty).withColumnRenamed("_bin", "_rbin"),
              F.col("_bin") == F.col("_rbin"))
        .where(overlap & (F.col("_bin") == start_bin))
        .drop("_bin", "_rbin")
    )
