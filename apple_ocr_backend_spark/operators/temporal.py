"""Temporal operators over an event stream: as-of join and sessionization.

Spark has no built-in as-of join (pandas ``merge_asof`` / kdb ``aj``
semantics); the composition here expresses it with one union + one window —
the "merge by key, carry the last observation forward" shape.  Cost model at
100 TB: ONE shuffle of both inputs on the join key, then a linear in-partition
sort-scan — the same cost as a sort-merge join, with no range-explosion
(a naive ``a.ts >= b.ts`` range join is O(|A| x |B|) per key and is the
shape to avoid).

Sessionization is the classic gaps-and-islands window: flag gaps greater
than the timeout, running-sum the flags into session ordinals.  One shuffle
on the entity key; everything else is in-partition.

Both operators use only JVM window expressions (no UDFs) and carry unique
tie-break orderings so results are engine- and partition-order-independent
(the DuckDB oracles replay the identical window semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_tie: str, payload: dict[str, str]) -> DataFrame:
    """For every ``left`` row, attach the most recent ``right`` row with
    the same ``on`` key and a STRICTLY earlier timestamp — backward as-of
    join (pandas ``merge_asof`` with ``allow_exact_matches=False``).

    ``payload`` maps output alias -> right column carried over.
    ``right_tie`` makes "most recent" total when several right rows share
    a timestamp: the LARGEST tie value wins.  Prior-ness is decided on the
    timestamp alone — the two sides' id spaces are unrelated, so a
    cross-side tie comparison would make equal-timestamp attachment depend
    on arbitrary id magnitudes (use ``asof_join_events`` when both sides
    come from ONE table and share an id space for sub-timestamp ordering).

    Implementation: tag + union both sides, one window per key ordered by
    ``(ts, side, right_tie)`` with left rows sorting BEFORE right rows at
    the same timestamp (so an equal-ts right row is never in the preceding
    frame), then ``last(payload_struct, ignorenulls)`` over the strictly
    preceding frame.  Exactly one shuffle (the window partition); no range
    join (a naive ``l.ts >= r.ts`` theta-join explodes per key), no
    per-key collect.
    """
    r_payload = F.struct(
        *[F.col(c).alias(a) for a, c in payload.items()])
    l_payload = F.struct(*[F.col(c) for c in left.columns])
    # derive each side's payload TYPE once so the other side can carry a
    # properly typed NULL through the union (cast accepts a DataType)
    r_type = right.select(r_payload.alias("x")).schema["x"].dataType
    l_type = left.select(l_payload.alias("x")).schema["x"].dataType
    tie_type = right.schema[right_tie].dataType
    lt = left.select(
        F.col(on).alias("__on"), F.col(ts).alias("__ts"),
        F.lit(None).cast(tie_type).alias("__tie"),
        F.lit(0).alias("__side"),
        l_payload.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"))
    rt = right.select(
        F.col(on).alias("__on"), F.col(ts).alias("__ts"),
        F.col(right_tie).alias("__tie"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(l_type).alias("__l"),
        r_payload.alias("__r"))
    both = lt.unionByName(rt)
    w = (W.partitionBy("__on").orderBy("__ts", "__side", "__tie")
         .rowsBetween(W.unboundedPreceding, -1))
    carried = both.withColumn("__asof",
                              F.last("__r", ignorenulls=True).over(w))
    return (carried.filter(F.col("__side") == 0)
            .select(F.col("__l.*"),
                    *[F.col(f"__asof.{a}").alias(f"asof_{a}")
                      for a in payload]))


def asof_join_events(events: DataFrame, left_type: str, right_type: str,
                     user_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id",
                     val_col: str = "value") -> DataFrame:
    """As-of join specialized to one event table filtered two ways (the
    common "attach the signup/feature snapshot active at purchase time"
    query): for each ``left_type`` event, the most recent strictly-prior
    ``right_type`` event of the same user.

    Same plan shape as ``asof_join`` but built directly on the single
    relation: ONE scan, one window shuffle.  Prior-ness is on the total
    order ``(ts, event_id)`` — a right event at the identical timestamp
    counts as prior only with a smaller event id, which both engines
    replay deterministically.
    """
    e = events.select(
        user_col, ts_col, id_col,
        F.col("event_type"),
        F.col(val_col),
        F.when(F.col("event_type") == right_type,
               F.struct(F.col(id_col).alias("r_id"),
                        F.col(ts_col).alias("r_ts"),
                        F.col(val_col).alias("r_value")))
        .alias("__r"))
    w = (W.partitionBy(user_col).orderBy(ts_col, id_col)
         .rowsBetween(W.unboundedPreceding, -1))
    carried = e.withColumn("__asof", F.last("__r", ignorenulls=True).over(w))
    return (carried.filter(F.col("event_type") == left_type)
            .select(F.col(id_col), F.col(user_col),
                    F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss")
                    .alias("ts_s"),
                    F.floor(F.col(val_col) * 100).cast("long")
                    .alias("value_cents"),
                    # no-prior-match rows coalesce to -1 so the output
                    # stays non-null numeric (cross-engine dtype stability)
                    F.coalesce(F.col("__asof.r_id"), F.lit(-1))
                    .cast("long").alias("asof_event_id"),
                    F.date_format("__asof.r_ts",
                                  "yyyy-MM-dd HH:mm:ss")
                    .alias("asof_ts_s"),
                    F.coalesce(F.floor(F.col("__asof.r_value") * 100),
                               F.lit(-1))
                    .cast("long").alias("asof_value_cents")))


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id",
               val_col: str = "value") -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    from the user's previous event exceeds ``gap_minutes``.  Returns one row
    per session: ordinal, bounds, event count, exact value total (cents
    idiom).

    Plan: one shuffle on the user key; ``lag`` + running ``sum`` + one
    map-side-combinable groupBy — no UDFs, no iterative steps.  Session
    state never materializes per-user lists, so a hot user costs one fat
    sorted partition slice, not driver memory (and the window order carries
    the event id tie-break for identical timestamps).
    """
    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    # parquet NTZ timestamps need the cast; gaps are differences, so the
    # session-timezone offset the cast introduces cancels exactly
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000),
                    1).otherwise(0)
    sess = (events
            .withColumn("__new", is_new)
            .withColumn("session_ord",
                        F.sum("__new").over(
                            w.rowsBetween(W.unboundedPreceding, 0))))
    return (sess.groupBy(user_col, "session_ord")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.date_format(F.min(ts_col),
                               "yyyy-MM-dd HH:mm:ss")
                 .alias("session_start"),
                 F.date_format(F.max(ts_col),
                               "yyyy-MM-dd HH:mm:ss")
                 .alias("session_end"),
                 F.sum(F.floor(F.col(val_col) * 100).cast("long"))
                 .alias("value_cents")))


def sessionize_two_phase(events: DataFrame, gap_minutes: int = 30,
                         bucket_minutes: int = 360,
                         user_col: str = "user_id", ts_col: str = "ts",
                         id_col: str = "event_id",
                         val_col: str = "value") -> DataFrame:
    """Hot-entity-safe sessionization — identical output to ``sessionize``
    with a bounded per-task slice for pathologically hot users.

    ``sessionize``'s single window puts ALL of a user's events in one
    sorted partition slice: a user with 10⁹ events serializes one task at
    100 TB.  This variant runs two combinable passes:

    1. pre-sessionize within ``(user, coarse time bucket)`` — the window
       partition carries at most one bucket's events per user, so task
       size is bounded by event rate × ``bucket_minutes``, not by a
       user's lifetime;
    2. merge boundary sessions: gaps-and-islands AGAIN over the (far
       smaller) local-session rows per user — a local session merges into
       its predecessor when its start is within the gap of the
       predecessor's end.

    Exactness: events are bucketed by their own timestamp, so each local
    session lies inside one bucket and, per user, local sessions are
    disjoint and time-ordered.  The first event of a bucket is the only
    place a local gap decision differs from the global one, and for it the
    phase-2 merge compares exactly the global quantities (its ts vs the
    previous event's ts = the previous local session's end) — so the merge
    decision equals the single-pass gap decision and the composed output
    is equal row-for-row (pinned against the same DuckDB oracle as
    ``sessionize``).  The phase-1 partition count per user ~ lifetime /
    bucket, the phase-2 rows per user ~ session count — both bounded;
    ``bucket_minutes`` is the task-size knob (same lever role as
    ``pack_sequences``' ``n_shards``).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    bucket_us = bucket_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    e = (events
         .withColumn("__us", us)
         .withColumn("__bucket", F.floor(F.col("__us") / bucket_us)))
    w1 = W.partitionBy(user_col, "__bucket").orderBy(ts_col, id_col)
    gap = F.col("__us") - F.lag("__us").over(w1)
    is_new = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    local = (e.withColumn("__new", is_new)
             .withColumn("__ord", F.sum("__new").over(
                 w1.rowsBetween(W.unboundedPreceding, 0)))
             .groupBy(user_col, "__bucket", "__ord")
             .agg(F.count(F.lit(1)).alias("__n"),
                  F.min(ts_col).alias("__start"),
                  F.max(ts_col).alias("__end"),
                  F.min("__us").alias("__start_us"),
                  F.max("__us").alias("__end_us"),
                  F.sum(F.floor(F.col(val_col) * 100).cast("long"))
                  .alias("__cents")))
    # per user, local-session starts are strictly increasing (sessions are
    # disjoint intervals); bucket+ord complete the order deterministically
    w2 = W.partitionBy(user_col).orderBy("__start_us", "__bucket", "__ord")
    gap2 = F.col("__start_us") - F.lag("__end_us").over(w2)
    new2 = F.when(gap2.isNull() | (gap2 > gap_us), 1).otherwise(0)
    merged = (local.withColumn("__new2", new2)
              .withColumn("session_ord", F.sum("__new2").over(
                  w2.rowsBetween(W.unboundedPreceding, 0))))
    return (merged.groupBy(user_col, "session_ord")
            .agg(F.sum("__n").alias("n_events"),
                 F.date_format(F.min("__start"),
                               "yyyy-MM-dd HH:mm:ss")
                 .alias("session_start"),
                 F.date_format(F.max("__end"),
                               "yyyy-MM-dd HH:mm:ss")
                 .alias("session_end"),
                 F.sum("__cents").alias("value_cents")))
