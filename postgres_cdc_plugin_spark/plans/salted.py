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
    # buckets or none (the SPARK-23207 correctness class).
    #
    # F.hash rejects MapType anywhere in a column's type tree (top-level
    # OR nested in struct/array), so map-bearing columns are detected
    # RECURSIVELY and excluded. A TOP-LEVEL map with map-free key/value
    # types still contributes via a canonical rendition — sorted
    # map_entries serialized to JSON: map iteration order is not
    # deterministic across recomputation, but the sorted entry array
    # is, so the salt stays replay-stable while hot-key rows that
    # differ only in that map still spread. Maps nested deeper stay
    # excluded (their rendition cannot be canonicalized without
    # rebuilding the tree); hot keys whose rows differ ONLY in such a
    # column share a salt — pre-compute a stable fingerprint column in
    # that case.
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    salt_inputs = []
    for f in left.schema.fields:
        if not _has_map(f.dataType):
            salt_inputs.append(F.col(f.name))
        elif isinstance(f.dataType, MapType) and not (
            _has_map(f.dataType.keyType) or _has_map(f.dataType.valueType)
        ):
            salt_inputs.append(
                F.to_json(F.array_sort(F.map_entries(F.col(f.name))))
            )
    if not salt_inputs:
        raise ValueError("salted_join needs >=1 saltable column")
    salted_left = left.withColumn(
        _SALT, F.pmod(F.hash(*salt_inputs), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    replicated_right = right.select("*", salts)
    return (
        salted_left.join(replicated_right, on=[*on, _SALT], how=how)
        .drop(_SALT)
    )
