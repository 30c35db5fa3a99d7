"""As-of (point-in-time) join — the temporal operator every
training-data / event pipeline needs and Spark lacks natively.

``asof_join(left, right, ...)`` attaches, to each left row, the right
row with the greatest timestamp <= the left row's timestamp within the
same key group (backward as-of, Pandas ``merge_asof`` / DuckDB
``ASOF JOIN`` semantics; ties on equal timestamps match).

Implementation is the scalable sort-merge composition, NOT a range
join: both sides are unioned with a side tag, one window per key
ordered by (ts, side) carries the last non-null right payload forward
(``F.last(ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT ROW),
and left rows are then filtered back out.  Cost is ONE shuffle by key
+ a per-partition sort — the same plan shape as a groupBy — versus the
O(|left| x |right-per-key|) blowup of the naive
``l.ts >= r.ts`` theta-join that Catalyst would otherwise plan as
BroadcastNestedLoop.  Skewed keys behave exactly like a skewed
window/groupBy (AQE handles them); at 10^12 rows pre-bucket both
sides by the key to make the union shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              payload: list[str] | None = None,
              tolerance_us: int | None = None) -> DataFrame:
    """Backward as-of join of ``right`` onto ``left``.

    Parameters
    ----------
    on: equality key column (present in both sides).
    ts: timestamp column (present in both sides).
    payload: right-side columns to attach (default: all but on/ts).
      Attached columns are NULL when no right row is at-or-before the
      left row's ts (left-join semantics).
    tolerance_us: optional max allowed gap in microseconds — matches
      farther in the past are nulled out (Pandas merge_asof tolerance).

    Right rows sharing (on, ts) are deduplicated deterministically by
    keeping the lexicographically-largest payload struct, so the result
    is layout-independent.
    """
    if payload is None:
        payload = [c for c in right.columns if c not in (on, ts)]

    r = right.select(on, ts, F.struct(*payload).alias("_asof_payload"))
    # deterministic within-(key, ts) winner — layout-independent
    w_dedup = Window.partitionBy(on, ts).orderBy(F.desc("_asof_payload"))
    r = (r.withColumn("_rn", F.row_number().over(w_dedup))
         .where(F.col("_rn") == 1).drop("_rn")
         .withColumn("_side", F.lit(0)))

    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before left rows on equal ts => ties match
    w = (Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = (u.withColumn("_asof", F.last("_asof_payload", ignorenulls=True)
                      .over(w))
         .withColumn("_asof_ts", F.last(F.when(F.col("_side") == 0,
                                               F.col(ts)),
                                        ignorenulls=True).over(w)))
    out = u.where(F.col("_side") == 1)
    # timestampdiff accepts TIMESTAMP and TIMESTAMP_NTZ alike
    # (unix_micros rejects ntz, the type parquet timestamps load as)
    gap = F.expr(f"timestampdiff(MICROSECOND, _asof_ts, `{ts}`)")
    if tolerance_us is not None:
        in_tol = gap <= F.lit(tolerance_us)
        out = (out.withColumn("_asof", F.when(in_tol, F.col("_asof")))
               .withColumn("_asof_ts", F.when(in_tol, F.col("_asof_ts"))))
    out = out.select(*left.columns,
                     *[F.col(f"_asof.{c}").alias(c) for c in payload],
                     F.col("_asof_ts").alias(f"asof_{ts}"),
                     gap.alias("asof_gap_us"))
    return out
