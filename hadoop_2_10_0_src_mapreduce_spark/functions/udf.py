"""UDF/UDAF/UDTF surface (SURVEY.md §2.10).

Parity map:
- Mapper.map (arbitrary 1→0..N Java)    → Column exprs first;
  ``map_in_pandas`` for genuinely imperative logic (Arrow-batched —
  never row-at-a-time Python in the hot path)
- Reducer.reduce (per-group iteration,
  values ordered by secondary sort)     → ``reduce_groups`` /
  ``secondary_sort_reduce`` (applyInPandas: the whole group as a
  DataFrame — strictly stronger than mark/reset MarkableIterator)
- Combiner                              → automatic (partial agg);
  custom UDAF → pandas_udf GROUPED_AGG
- Hadoop Streaming (PipeMapper/Reducer) → ``pipe_lines`` (rdd.pipe —
  fork the command per partition, lines over stdin/stdout)
- Partitioner.getPartition              → repartition(n, expr)
  (sortpart.repartition_by_key)

Scale notes: applyInPandas shuffles on the group key and materializes
ONE GROUP per pandas frame — fine for bounded groups (a user's events),
wrong for giant groups (use window functions or salting first).
rdd.pipe forks one subprocess per partition, not per record; it is
still the slow path (serialize→text→parse) and exists for parity, not
for new code.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def pipe_lines(
    df: DataFrame,
    command: str,
    *,
    input_cols: Sequence[str] | None = None,
    sep: str = "\t",
    output_schema: str = "value string",
) -> DataFrame:
    """Hadoop Streaming parity (STREAMING/PipeMapRed.java [H]): fork
    ``command`` once per partition, write records as sep-joined lines
    to stdin, read output lines back.

    Returns a DataFrame of ``output_schema`` (default: raw lines in
    ``value``; pass e.g. ``"key string, value string"`` to re-split on
    the first separator like a streaming reducer's output contract).
    """
    cols = input_cols or df.columns
    lines = df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]).alias("value")
    )
    piped = lines.rdd.map(lambda r: r.value).pipe(command)
    spark = df.sparkSession
    out = spark.createDataFrame(piped.map(lambda line: (line,)), "value string")
    n_fields = len(StructType.fromDDL(output_schema).fields)
    if n_fields == 1 and output_schema.strip().startswith("value"):
        return out
    parts = F.split(F.col("value"), sep, n_fields)
    fields = StructType.fromDDL(output_schema).fields
    return out.select(
        *[
            F.get(parts, i).cast(f.dataType).alias(f.name)
            for i, f in enumerate(fields)
        ]
    )


def map_in_pandas(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str | StructType,
) -> DataFrame:
    """General Mapper.map parity for logic Column exprs can't express:
    Arrow-batched, 0..N output rows per input row."""

    def gen(batches):
        for pdf in batches:
            out = fn(pdf)
            if len(out):
                yield out

    return df.mapInPandas(gen, schema)


def reduce_groups(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str | StructType,
    *,
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Reducer.reduce parity: ``fn`` sees one full group as a pandas
    DataFrame, optionally pre-sorted by ``order_by`` — the exact
    secondary-sort contract (composite key + grouping comparator,
    SURVEY §2.5): values arrive ordered within the group.

    Sorting INSIDE the pandas group (not sortWithinPartitions) because
    applyInPandas re-shuffles on the keys; per-group sort is the only
    ordering guarantee that survives, and it's O(group log group).
    """
    if order_by:
        ob = list(order_by)

        def wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
            return fn(pdf.sort_values(ob, kind="mergesort"))

        return df.groupBy(*keys).applyInPandas(wrapped, schema)
    return df.groupBy(*keys).applyInPandas(fn, schema)


def secondary_sort_reduce(
    df: DataFrame,
    group_keys: Sequence[str],
    sort_keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str | StructType,
) -> DataFrame:
    """Named alias making the SecondarySort example's contract explicit
    (EX/SecondarySort.java [H]: IntPair composite key +
    FirstGroupingComparator → reducer sees values sorted)."""
    return reduce_groups(df, group_keys, fn, schema, order_by=sort_keys)


def cogroup_bucket_count(
    cores: int,
    est_input_bytes: int,
    *,
    floor: int = 16,
    target_bytes_per_bucket: int = 64 << 20,
) -> int:
    """Bucket count for a bucketed cogroup/applyInPandas: the dial
    between per-call Python overhead (each group pays one Python
    invocation + its own Arrow batch — fewer buckets is faster) and
    per-group memory (a bucket's rows arrive as ONE pandas frame —
    more buckets is safer).

    ``max(floor, cores // 4, ceil(bytes / target))``: the measured
    floor (16 beat 64 at sf0.1/32 cores — r12), a cores term so big
    clusters keep their parallelism, and a DATA-SIZE term so per-group
    frames stay bounded on a fixed cluster as the corpus grows (the
    r12 advice: a cores-only dial let groups grow without bound with
    data). ``est_input_bytes`` is the cogroup inputs' combined
    plan-time size estimate; 64 MiB per bucket keeps the per-group
    pandas frame (which materializes ~2-3x the Arrow bytes) well under
    typical task memory."""
    data_term = -(-int(est_input_bytes) // target_bytes_per_bucket)  # ceil
    return max(floor, cores // 4, data_term)


def cogroup_reduce(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    fn: Callable[[tuple, pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: str | StructType,
    *,
    left_order: Sequence[str] | None = None,
    right_order: Sequence[str] | None = None,
) -> DataFrame:
    """DATAJOIN tagged-reduce parity: the reference's multi-input
    reducer saw ALL values for a key from BOTH tagged sources in one
    ``reduce(key, values)`` call (TOOLS/datajoin DataJoinReducerBase
    [H] conventions per SURVEY §0) — the imperative escape hatch for
    per-key merge logic no join expresses (asymmetric reconciliation,
    ordered interleaving, custom conflict resolution).

    ``fn(key_tuple, left_pdf, right_pdf)`` runs once per distinct key
    with each side's full group (empty frame when the key is absent on
    one side — why the key arrives as an explicit tuple), optionally
    pre-sorted via ``left_order``/``right_order`` (the secondary-sort
    contract, applied per side inside the group like reduce_groups).

    Scale shape: one co-partitioning shuffle of each input on the
    keys; group cost bounds memory exactly like any applyInPandas —
    keep per-key groups bounded (pre-aggregate a hot side first) and
    prefer a declarative join + agg whenever one expresses the logic.
    When keys are FINE-GRAINED (per-key groups of a few rows), cogroup
    on a BUCKET of keys instead (e.g. ``pmod(key, B)``) and vectorize
    the per-key merge inside fn with pandas groupbys: applyInPandas
    pays a Python invocation + Arrow batch per group (~3–5 ms), so
    thousands of tiny groups cost seconds where B bucket groups cost
    milliseconds — the catalog's clicks-after-last-error branch is the
    worked example.
    """
    lo = list(left_order) if left_order else None
    ro = list(right_order) if right_order else None
    lcols, rcols = list(left.columns), list(right.columns)
    # Same-lineage guard: when both inputs derive from ONE scan (the
    # common "split a table by predicate, cogroup the halves" shape),
    # the two plans share attribute ids and FlatMapCoGroupsInPandas
    # silently PRUNES the right side down to its grouping columns —
    # fn would see the right frame missing its value columns entirely.
    # Re-aliasing every right column mints fresh expression ids (a pure
    # projection — no materialization, no extra exchange), which is
    # the same dedup the analyzer applies to self-joins.
    right = right.select([F.col(c).alias(c) for c in rcols])

    def wrapped(key: tuple, lpdf: pd.DataFrame, rpdf: pd.DataFrame):
        # a key absent on one side arrives as an empty frame missing
        # that side's non-key columns — normalize so fn can index its
        # declared columns unconditionally (reindex is a no-op when the
        # columns already match)
        if list(lpdf.columns) != lcols:
            lpdf = lpdf.reindex(columns=lcols)
        if list(rpdf.columns) != rcols:
            rpdf = rpdf.reindex(columns=rcols)
        if lo:
            lpdf = lpdf.sort_values(lo, kind="mergesort")
        if ro:
            rpdf = rpdf.sort_values(ro, kind="mergesort")
        return fn(key, lpdf, rpdf)

    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(wrapped, schema)
    )


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 720.0,
) -> DataFrame:
    """The canonical manual-sessionization reducer (the reference's
    only 'stateful' pattern, SURVEY §2.9): per user, order events by
    time; a gap > ``gap_minutes`` starts a new session.

    Physical strategy is the hardened MapReduce secondary-sort shape:
    ``repartition(user)`` routes each user to exactly one partition,
    ``sortWithinPartitions(user, ts)`` is the composite-key sort, and a
    single ``mapInPandas`` pass streams each sorted partition with
    bounded memory — vectorized across ALL users in a batch (no
    per-group Python call, unlike applyInPandas) and carrying the open
    session across Arrow batch boundaries, exactly as a Hadoop reducer
    streamed values. Returns one row per session:
    (user_id, session_id, n_events, start_ts, end_ts).
    """
    gap = pd.Timedelta(minutes=gap_minutes)
    out_cols = [user_col, "session_id", "n_events", "start_ts", "end_ts"]

    def _carry_frame(carry):
        return pd.DataFrame(
            {
                user_col: [carry[0]], "session_id": [carry[1]],
                "n_events": [carry[2]], "start_ts": [carry[3]],
                "end_ts": [carry[4]],
            }
        )

    def per_partition(batches):
        carry = None  # open session: [user, session_ordinal, n, start, end]
        for pdf in batches:
            if pdf.empty:
                continue
            u, ts = pdf[user_col], pdf[ts_col]
            brk = (u != u.shift()) | (ts.diff() > gap)
            brk.iloc[0] = carry is None or u.iloc[0] != carry[0] or bool(
                ts.iloc[0] - carry[4] > gap
            )
            grp = brk.cumsum()  # group 0 = continuation of carried session
            agg = pdf.groupby(grp, sort=True).agg(
                **{
                    user_col: (user_col, "first"),
                    "n_events": (ts_col, "size"),
                    "start_ts": (ts_col, "min"),
                    "end_ts": (ts_col, "max"),
                }
            ).reset_index(drop=True)
            # session_id = 0-based ordinal within user, shifted for the
            # carried user by (their open ordinal) + 1 if row 0 broke
            agg["session_id"] = agg.groupby(user_col, sort=False).cumcount()
            closed_carry = None
            if carry is not None:
                if agg[user_col].iloc[0] == carry[0]:
                    same = agg[user_col] == carry[0]
                    agg.loc[same, "session_id"] += carry[1] + int(brk.iloc[0])
                if brk.iloc[0]:
                    # the carried session is CLOSED by this batch's first
                    # row (new user or gap) — it must be emitted, not
                    # silently overwritten
                    closed_carry = _carry_frame(carry)
                else:  # merge carried open session into group 0
                    agg.loc[0, "n_events"] += carry[2]
                    agg.loc[0, "start_ts"] = carry[3]
            last = agg.iloc[-1]
            carry = [
                last[user_col], int(last["session_id"]), int(last["n_events"]),
                last["start_ts"], last["end_ts"],
            ]
            done = agg.iloc[:-1][out_cols]
            if closed_carry is not None:
                done = pd.concat([closed_carry, done], ignore_index=True)
            if not done.empty:
                yield done
        if carry is not None:
            yield _carry_frame(carry)

    return (
        events.select(user_col, ts_col)
        .repartition(user_col)
        .sortWithinPartitions(user_col, ts_col)
        .mapInPandas(
            per_partition,
            f"{user_col} long, session_id long, n_events long, "
            "start_ts timestamp_ntz, end_ts timestamp_ntz",
        )
    )
