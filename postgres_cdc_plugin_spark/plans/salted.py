"""Salted join: manual skew mitigation for shuffle joins.

AQE's skew-join splitting (on in session.py) handles most skew by
splitting oversized partitions at runtime, but it only works for
sort-merge joins of materialized shuffle blocks. When one join key is so
hot that a single key exceeds an executor (the power-law user, the NULL
bucket, the default tenant), pre-salting is the standard fix:

  * the LEFT (big, skewed) side gets a deterministic salt in [0, n)
    derived from non-key columns, splitting each hot key into n
    sub-keys;
  * the RIGHT side is replicated n times, once per salt value;
  * the join runs on (key, salt), spreading each hot key over n tasks.

Cost model: right side shuffles n copies — use for big-big joins where
the right side is much smaller than the left but too big to broadcast
(a broadcast join needs no salting: it never shuffles the left side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `left` with `right` on `on`, salted `n_salts` ways.

    Supported how: inner, left (the replicated-right construction keeps
    exactly one match group per (key, salt), so left-outer semantics
    survive). Result columns = the plain join's.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # salt from the row's position, not a row hash: hashing all columns
    # throws on MapType inputs and gives ZERO spread when the hot key's
    # rows are identical (the exact case salting exists for). The salt
    # only picks WHICH replica of the right side a left row meets —
    # every replica holds the same match group, so join results are
    # identical for any salt assignment.
    salted_left = left.withColumn(
        _SALT,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    replicated_right = right.select("*", salts)
    return (
        salted_left.join(replicated_right, on=[*on, _SALT], how=how)
        .drop(_SALT)
    )
