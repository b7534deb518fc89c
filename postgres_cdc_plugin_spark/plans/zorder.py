"""Z-order (Morton) interleaved sort keys for multi-dimensional file
layout.

A table sorted (or range-partitioned) by a single column gives parquet
min/max pruning on that column only; sorting by the bit-interleaved key
of two columns clusters BOTH dimensions — every contiguous z-range is a
quad-tree cell with bounded extent in each dimension, so file-level
min/max statistics prune selective predicates on either column. This is
the standard lakehouse layout technique for 100 TB fact tables queried
along several axes.

Built entirely from JVM integer expressions (shifts, masks, adds) so
key computation rides whole-stage codegen and the same formula mirrors
into the DuckDB oracle verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BITS = 16  # per-dimension bits interleaved into a 32-bit z-value


def zorder_key(a: Column, b: Column, bits: int = _BITS) -> Column:
    """Interleave the low `bits` of two non-negative integer columns:
    bit i of `a` lands at position 2i, bit i of `b` at 2i+1. The
    result orders rows along the Z space-filling curve of (a, b)."""
    a = a.cast("bigint") % (1 << bits)
    b = b.cast("bigint") % (1 << bits)
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key_sql(a: str, b: str, bits: int = _BITS) -> str:
    """The same interleave as ANSI SQL text (DuckDB dialect: >> << & are
    native operators) — oracle mirror of zorder_key."""
    a_expr = f"(CAST({a} AS BIGINT) % {1 << bits})"
    b_expr = f"(CAST({b} AS BIGINT) % {1 << bits})"
    terms = []
    for i in range(bits):
        terms.append(f"((({a_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b_expr} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)
