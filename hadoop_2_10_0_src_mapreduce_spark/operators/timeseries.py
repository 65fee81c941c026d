"""Time-series rolling analytics over pre-aggregated series.

Extension beyond the reference: Hadoop MR users hand-rolled running
aggregates inside a secondary-sorted reducer (sort on (key, ts), carry
state across values — SURVEY §2.5/§2.10); Spark's window functions are
the declarative twin. These helpers compute the standard per-series
metric family — previous value (lag), trailing moving average, running
cumulative sum, percent rank — in ONE projection over a series frame.

Scale shape: callers window over a PRE-AGGREGATED series (one row per
(series key, time bucket) — the groupBy that builds it is an ordinary
shuffle-partitioned aggregate), so each window partition holds only
the series' bucket count, not its raw events. That is the difference
between a window over 30 daily rows and a window funneling a billion
raw events through one task: aggregate first, then window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rolling_metrics(
    series: DataFrame,
    *,
    part_col: str,
    order_col: str,
    value_col: str,
    mavg_window: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Per-series rolling metric family in one pass.

    Returns the series columns plus:

    - ``value``  — the bucket's value, cast double
    - ``lag1``   — previous bucket's value (NULL at each series head)
    - ``mavg{w}``— trailing moving average over the last ``w`` observed
                   buckets (ROWS, not RANGE: gaps shrink the window —
                   densify the series upstream if calendar semantics
                   are required)
    - ``cume``   — running sum from the series head
    - ``prank``  — percent_rank of the bucket's value within its series

    Engine-exactness: inputs that are integer counts keep every sum
    exact in binary64 (mavg's single division and percent_rank's exact
    rational are each one deterministic rounding), so results hash-match
    a SQL oracle computing the same window frames.
    """
    w = Window.partitionBy(part_col).orderBy(order_col)
    wm = w.rowsBetween(-(mavg_window - 1), 0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wv = Window.partitionBy(part_col).orderBy(value_col)
    v = F.col(value_col).cast("double")
    return series.select(
        F.col(part_col),
        F.col(order_col),
        v.alias("value"),
        F.lag(v).over(w).alias("lag1"),
        F.round(F.avg(v).over(wm), round_digits).alias(f"mavg{mavg_window}"),
        F.sum(v).over(wc).alias("cume"),
        F.round(F.percent_rank().over(wv), round_digits).alias("prank"),
    )


def _funnel_any_chain(
    events: DataFrame,
    stages: list[str],
    user_col: str,
    ts_col: str,
    type_col: str,
    max_gap_minutes: int | None,
) -> DataFrame:
    """EXISTS-A-CHAIN reachability, one stage per round (see
    ``funnel(anchor="any")``). Round k unions the reachable
    stage-(k−1) events (marked) with the stage-k candidates and runs
    ONE per-user window scan ordered by (ts, marker ASC): the running
    max of marked timestamps among strictly-preceding rows is the
    latest reachable predecessor — marker-ascending puts candidates
    BEFORE equal-ts predecessors, enforcing the strict t' < t without
    a range frame. A candidate is reachable iff that predecessor
    exists and sits within the gap window. Returns the per-stage
    earliest-reachable completion frame (_ts0.._tsK, left-joined on
    the user key), the same shape the fixed-anchor loop builds."""
    u, t = F.col(user_col), F.col(ts_col)
    reach = events.where(F.col(type_col) == stages[0]).select(user_col, ts_col)
    cur = reach.groupBy(user_col).agg(F.min(t).alias("_ts0"))
    for k, st in enumerate(stages[1:], 1):
        marked = reach.select(u, t, F.lit(1).alias("_is_prev"))
        cands = (
            events.where(F.col(type_col) == st)
            .select(u, t, F.lit(0).alias("_is_prev"))
        )
        w = (
            Window.partitionBy(user_col)
            .orderBy(ts_col, "_is_prev")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        latest_prev = F.max(
            F.when(F.col("_is_prev") == 1, t)
        ).over(w)
        scanned = marked.unionByName(cands).withColumn("_lp", latest_prev)
        window_ok = (
            t <= F.col("_lp") + F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
            if max_gap_minutes is not None
            else F.lit(True)
        )
        reach = (
            scanned.where(
                (F.col("_is_prev") == 0)
                & F.col("_lp").isNotNull()
                & window_ok
            )
            .select(user_col, ts_col)
        )
        cur = cur.join(
            reach.groupBy(user_col).agg(F.min(t).alias(f"_ts{k}")),
            user_col,
            "left",
        )
    return cur


def funnel(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_minutes: int | None = None,
    anchor: str = "first",
) -> DataFrame:
    """Ordered FUNNEL analysis — how deep each user progresses through
    an event-type sequence (view → click → purchase), the conversion
    query every event pipeline runs. Stage semantics: stage k counts
    iff the user has a stage-k event STRICTLY AFTER their stage-(k−1)
    completion time, where completion time is the EARLIEST qualifying
    event (earliest stage-1 event; then earliest stage-2 event after
    it; ...) — the standard unordered-window-free funnel definition,
    fully deterministic and relational, so a SQL oracle can replay it
    with chained min-after joins.

    Returns one row per user with ≥1 first-stage event:
    (user_col, stages_completed, stage_ts array<ts_type> — the
    per-stage completion times, null-padded after the drop-off —
    start_ts, end_ts = first/deepest completion).

    Scale shape: K−1 rounds of filtered-scan → per-user min → equi
    join on the user key (broadcastable while the surviving funnel
    population is small, which is what funnels do); no windows over
    raw events, no Python, no nested loop. Users, never events, ride
    the joins after round 0.

    ``max_gap_minutes`` adds the CONVERSION-WINDOW constraint real
    funnel reporting uses: stage k only counts within that many
    minutes of the stage-(k−1) completion — a purchase three weeks
    after the click is not a conversion. The constraint composes with
    the earliest-after rule as a plain upper bound on the same min:
    whenever ANY qualifying in-window event exists, the earliest one
    is in-window too. Caveat: that guarantee is PER STEP given the
    fixed anchor — with ``anchor="first"`` (the default) the chain
    stays anchored at the user's EARLIEST stage-1 event, so
    gap-constrained results can differ from any-valid-chain funnel
    definitions (a@0, a@100, b@105 with gap=30 counts depth 1 here:
    the a@100 anchor that would have reached b is never considered).

    ``anchor="any"`` closes that gap with EXISTS-A-CHAIN semantics
    (the definition industry funnel tools use): a user reaches stage k
    iff SOME strictly-increasing event chain e₁<…<e_k of the right
    types exists with every step inside the gap window. Computed
    stage-by-stage without enumerating chains: an event of stage k is
    REACHABLE iff the LATEST reachable stage-(k−1) event strictly
    before it is within the gap — one union + one per-user window scan
    over only the two stages' events per round (the user's whole
    two-type sequence lands in one window partition, the same
    per-user-sequence shape as sessionization; no joins, no chain
    blow-up). Equals ``anchor="first"`` exactly when
    ``max_gap_minutes`` is None (no gap ⇒ after-the-earliest-chain is
    the only constraint — property-tested), so "any" only ever widens
    gap-constrained funnels. Reported ``stage_ts`` entries are the
    EARLIEST reachable event per stage — each individually certified
    by some valid chain, though the k timestamps need not form one
    chain together (the a@0/a@100/b@105 example reports [0, 105])."""
    if anchor not in ("first", "any"):
        raise ValueError(f"anchor must be 'first' or 'any', got {anchor!r}")
    if len(stages) < 2:
        raise ValueError(f"funnel needs >= 2 stages, got {stages!r}")
    if max_gap_minutes is not None and (
        not isinstance(max_gap_minutes, int) or max_gap_minutes <= 0
    ):
        # the value is interpolated into an INTERVAL literal — a float
        # would fail deep in analysis with an opaque parse error
        raise ValueError(
            f"max_gap_minutes must be a positive int, got {max_gap_minutes!r}"
        )
    working = {f"_ts{k}" for k in range(len(stages))}
    clash = working.intersection((user_col, ts_col))
    if clash:
        raise ValueError(
            f"user_col/ts_col collide with funnel working columns: "
            f"{sorted(clash)}"
        )
    u, t = F.col(user_col), F.col(ts_col)
    # NULL timestamps can never order against anything — drop them up
    # front so no user surfaces as an impossible depth-0 row
    events = events.where(t.isNotNull())
    if anchor == "any":
        cur = _funnel_any_chain(
            events, stages, user_col, ts_col, type_col, max_gap_minutes
        )
    else:
        cur = (
            events.where(F.col(type_col) == stages[0])
            .groupBy(user_col)
            .agg(F.min(t).alias("_ts0"))
        )
        for k, st in enumerate(stages[1:], 1):
            prev = F.col(f"_ts{k-1}")
            window_ok = (
                t <= prev + F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
                if max_gap_minutes is not None
                else F.lit(True)
            )
            nxt = (
                events.where(F.col(type_col) == st)
                .select(user_col, ts_col)
                .join(cur.select(user_col, f"_ts{k-1}"), user_col)
                .where((t > prev) & window_ok)
                .groupBy(user_col)
                .agg(F.min(t).alias(f"_ts{k}"))
            )
            cur = cur.join(nxt, user_col, "left")
    ts_cols = [F.col(f"_ts{k}") for k in range(len(stages))]
    completed = sum(
        (F.when(c.isNotNull(), 1).otherwise(0) for c in ts_cols), F.lit(0)
    )
    return cur.select(
        u,
        completed.cast("long").alias("stages_completed"),
        F.array(*ts_cols).alias("stage_ts"),
        F.col("_ts0").alias("start_ts"),
        F.coalesce(*reversed(ts_cols)).alias("end_ts"),
    )
