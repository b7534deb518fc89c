"""Shared batch-directory visibility rule for the ledger family.

Every ledger lands each micro-batch as an overwritten `batch=<id>`
parquet directory (exactly-once output from at-least-once foreachBatch).
A crash MID-write leaves a torn dir: either only `_temporary` task
droppings (the read fails schema inference) or, for a ledger that lands
two relations per batch, one relation without its sibling (the read
succeeds but the ledger is internally inconsistent — the r8-advice
class first found in the C4 line ledger). The checkpoint replays the
batch and the overwrite completes it; until then read-backs must not
see it.

The completeness witness is the `_SUCCESS` marker the
FileOutputCommitter writes at JOB commit — files only move out of
`_temporary` at the same commit, so marker-present == relation-complete.
`committed_batch_dirs` is that rule in one place; ledgers that land two
sibling relations per batch additionally intersect the committed batch
ids of both roots so a batch becomes visible atomically or not at all.
"""

from __future__ import annotations

import os


def committed_batch_dirs(root: str) -> list[str]:
    """Absolute paths of `batch=<id>` dirs under `root` whose parquet
    job committed (`_SUCCESS` present), sorted by directory name."""
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith("batch=")
        and os.path.exists(os.path.join(root, d, "_SUCCESS"))
    )


def committed_batch_ids(root: str) -> set[str]:
    """The `batch=<id>` directory NAMES with a committed job under
    `root` — for ledgers that must intersect sibling relations."""
    return {os.path.basename(p) for p in committed_batch_dirs(root)}
