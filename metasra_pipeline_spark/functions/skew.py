"""Explicit key-salting for skewed equi-joins.

The north_rule requires "partitioning / shuffle / skew handled
explicitly".  The engine defends against skew in three layers, applied
in this order:

1. **Structural** — remove the hubs before any join: exact-duplicate
   star contraction and hot-blocking-key caps (``er/resolution.py``
   blocking: keys whose doc count exceeds ``max_block`` are dropped and
   logged to the metrics frame).
2. **Adaptive** — ``spark.sql.adaptive.skewJoin.enabled`` (session.py)
   splits residual skewed partitions at runtime with no plan change.
3. **Explicit salting (this module)** — for deployments where AQE is
   unavailable (old clusters, forced shuffle-hash joins, streaming
   micro-batches) or the hot keys are known a priori, :func:`salted_join`
   removes the single-partition bottleneck deterministically, at plan
   time.

Aggregations (e.g. CC's min-neighbor ``groupBy("u").agg(min...)``) do
NOT need salting: Spark's hash aggregate partially aggregates map-side,
so a hot group contributes one row per map task to the shuffle, not one
row per input row.  Salting matters for *joins*, where every row of the
hot key on the big side lands in one shuffle partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__skew_salt"


def salted_join(big: DataFrame, small: DataFrame, on: str,
                num_salts: int = 8,
                scatter_cols: list[str] | None = None,
                how: str = "inner") -> DataFrame:
    """``big.join(small, on=on, how=how)`` with explicit key salting.

    ``small`` must be small *per key* (e.g. exactly one row per key, as
    in connected-components' min-neighbor frame) but may be large
    overall — so broadcasting is not an option.  The small side is
    replicated ``num_salts``× via a broadcast cross join (narrow, no
    shuffle of ``small`` beyond the one the join itself needs); the big
    side scatters each row into one of the salt buckets by
    ``pmod(xxhash64(scatter_cols), num_salts)``; the join runs on
    ``(on, salt)``.  A key with 10⁸ rows on the big side now occupies
    ``num_salts`` shuffle partitions instead of one.

    Output is row-multiset-equal to the plain join (each big row joins
    the one salt replica it scattered to).  Supported ``how``: inner and
    left — replicating the small side would duplicate unmatched rows
    under right/outer semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if scatter_cols is None:
        scatter_cols = [c for c in big.columns if c != on]
    if not scatter_cols:
        raise ValueError("need at least one non-key column to scatter by")
    salts = (big.sparkSession.range(num_salts)
             .select(F.col("id").cast("int").alias(_SALT)))
    small_rep = small.crossJoin(F.broadcast(salts))
    big_s = big.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*scatter_cols), F.lit(num_salts)).cast("int"))
    return big_s.join(small_rep, on=[on, _SALT], how=how).drop(_SALT)
