"""Partitioning utilities — parallelism guards for explode-heavy operators.

Spark sizes a parquet scan's partitions by bytes
(``spark.sql.files.maxPartitionBytes``), so a compact input — one small
file locally, or a handful of heavily-compressed row groups anywhere —
can enter the plan as one or two partitions.  That is fine for a scan,
but an operator that *expands* its input (shingle explode, token explode:
5-50x row growth) then does all its downstream join/aggregate work at the
input's parallelism: broadcast joins add no exchange, so nothing ever
re-partitions and one task does everything.

``ensure_min_parallelism`` is the declarative fix: round-trip through one
hash repartition only when the input has fewer partitions than the
session's default parallelism.  On a real cluster reading a real table
(thousands of splits) it is a no-op; on a compact input it buys full
fan-out for one cheap shuffle of the *pre-explode* rows — always smaller
than shuffling the exploded output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ensure_min_parallelism", "salted_join"]


def ensure_min_parallelism(
    df: DataFrame, *keys: Column | str, min_partitions: int | None = None
) -> DataFrame:
    """Repartition ``df`` (hash on ``keys`` if given, else round-robin) up
    to the session default parallelism — but only if the plan currently has
    fewer partitions.  No-op (and no shuffle) on already-parallel inputs.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: split every hot key across ``n_salts`` reducers.

    A shuffled join on a skewed key sends each key's entire row volume to
    ONE reducer — the classic straggler at 100 TB (one task runs for hours
    while the rest idle).  Salting rewrites the join key to
    ``(key, salt)``: the big/skewed ``left`` side gets a salt derived from
    its row content (any routing value works — correctness never depends
    on it), and the smaller ``right`` side is replicated once per salt
    value, so every (key, salt) bucket joins independently.  Hot-key work
    now spreads across ``n_salts`` tasks at the cost of an ``n_salts``-x
    blow-up of the right side — the standard trade when the right side is
    modest but too big (or too mutable) to broadcast.

    Prefer AQE's automatic skew-join splitting
    (``spark.sql.adaptive.skewJoin``) when post-shuffle partition stats
    are available; explicit salting is for the cases AQE can't see —
    pre-aggregated inputs, stream-side joins, or deliberately pinned
    plans.  The ``shuffle_hash`` hint keeps the planner from broadcasting
    the replicated side, which would defeat the demonstration (and with a
    broadcast there is no shuffle to skew in the first place).

    Only ``inner`` and ``left`` modes are sound: the right side is
    replicated once per salt value BEFORE the join, so any mode that
    preserves unmatched right rows ('right'/'full') would emit each of
    them ``n_salts`` times.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "right-preserving modes would duplicate unmatched right rows "
            "once per salt"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)
    ).cast("int")
    salted_left = left.withColumn("__salt", salt)
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    ).hint("shuffle_hash")
    joined = salted_left.join(salted_right, [key, "__salt"], how)
    return joined.drop("__salt")
