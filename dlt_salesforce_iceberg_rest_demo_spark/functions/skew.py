"""Skew-handling join utilities.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
the session factory) handles most skew at runtime; this module holds the
explicit salting pattern for the cases AQE can't fix - a *broadcast-
ineligible* build side joined on a pathologically hot key (the
reference's FK distributions are skewed by design: ~4 contacts per
account with random_reference, data/salesforce_medium_scale.recipe.yml).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key shuffle fanned out ``salt`` ways.

    left (the skewed, large side) gets a deterministic per-row salt in
    [0, salt); right is replicated ``salt`` times with every salt value.
    The join key becomes (on, salt), splitting each hot key's rows
    across ``salt`` reducers instead of one straggler task. Cost: the
    right side shuffles salt x its size - use only when right is too
    big to broadcast and the left's key histogram is heavy-tailed.

    Salt is derived from stable row content (xxhash64 of all left
    columns), not rand(): re-running the job yields the same partition
    assignment, keeping shuffle-level retries deterministic.
    """
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_salted = left.withColumn("__salt", salt_col.cast("int"))
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_salted, [on, "__salt"], how)
    return out.drop("__salt")
