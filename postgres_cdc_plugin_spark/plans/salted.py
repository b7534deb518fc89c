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
    # Deterministic salt over the HASHABLE columns: determinism matters
    # because a nondeterministic salt (rand / monotonically_increasing_id)
    # can re-salt rows differently when a lost task recomputes, and a
    # partially-fetched shuffle then sees a row in two (key, salt)
    # buckets or none (the SPARK-23207 correctness class). MapType
    # columns are excluded — F.hash rejects them. Limitation: byte-
    # identical duplicate rows of the hot key share a salt; duplicates
    # of a hot key in practice differ in some payload column, and fully
    # identical rows should be deduped before a join anyway.
    from pyspark.sql.types import MapType

    hashable = [
        f.name
        for f in left.schema.fields
        if not isinstance(f.dataType, MapType)
    ]
    if not hashable:
        raise ValueError("salted_join needs >=1 non-map column to salt on")
    salted_left = left.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in hashable]), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    replicated_right = right.select("*", salts)
    return (
        salted_left.join(replicated_right, on=[*on, _SALT], how=how)
        .drop(_SALT)
    )
