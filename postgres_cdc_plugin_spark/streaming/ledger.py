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


def _looks_complete_unmarked(path: str) -> bool:
    """A batch dir with data files, no `_temporary` droppings, and no
    `_SUCCESS` is the signature of the marker being DISABLED
    (mapreduce.fileoutputcommitter.marksuccessfuljobs=false, a common
    cloud-committer tuning) — job commit moved files out of
    `_temporary` but never wrote the witness. A genuinely torn batch
    instead has `_temporary` leftovers or no data files at all."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return False
    if os.path.isdir(os.path.join(path, "_temporary")):
        return False
    try:
        names = os.listdir(path)
    except OSError:
        return False
    return any(n.endswith(".parquet") for n in names)


def committed_batch_dirs(root: str) -> list[str]:
    """Absolute paths of `batch=<id>` dirs under `root` whose parquet
    job committed (`_SUCCESS` present), sorted by directory name.

    Fails loudly instead of returning [] when every batch dir looks
    complete but unmarked: with the success marker disabled each
    committed batch would be PERMANENTLY invisible and every read-back
    would silently return None forever (r9 advice #2). One unmarked
    dir beside committed siblings is not an error — the
    FileOutputCommitter writes `_SUCCESS` an instant after the file
    moves, so a racing reader may see that window on the newest batch;
    it becomes visible on the next read."""
    if not os.path.isdir(root):
        return []
    batch_dirs = [
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith("batch=")
    ]
    committed = sorted(
        p for p in batch_dirs if os.path.exists(os.path.join(p, "_SUCCESS"))
    )
    if not committed:
        unmarked = [p for p in batch_dirs if _looks_complete_unmarked(p)]
        if unmarked:
            raise RuntimeError(
                "ledger read-back found complete-looking batch dirs with "
                f"no _SUCCESS marker under {root!r} (e.g. {unmarked[0]!r}) "
                "and zero committed batches: is "
                "mapreduce.fileoutputcommitter.marksuccessfuljobs "
                "disabled? With the marker off every committed batch is "
                "permanently invisible to the ledger."
            )
    return committed


def committed_batch_ids(root: str) -> set[str]:
    """The `batch=<id>` directory NAMES with a committed job under
    `root` — for ledgers that must intersect sibling relations."""
    return {os.path.basename(p) for p in committed_batch_dirs(root)}


def committed_nested_batch_ids(root: str, subs: tuple[str, ...]) -> set[str]:
    """`batch=<id>` names under `root` where EVERY nested relation in
    `subs` committed (`batch=<id>/<sub>/_SUCCESS`) — the C4 line
    ledger's two-writes-one-dir layout. Same loud marker-disabled
    failure as committed_batch_dirs: all batches complete-looking but
    none marked means the committer config ate the witness."""
    if not os.path.isdir(root):
        return set()
    batches = [d for d in os.listdir(root) if d.startswith("batch=")]
    ok = {
        d
        for d in batches
        if all(
            os.path.exists(os.path.join(root, d, s, "_SUCCESS"))
            for s in subs
        )
    }
    if not ok:
        unmarked = [
            os.path.join(root, d, s)
            for d in batches
            for s in subs
            if _looks_complete_unmarked(os.path.join(root, d, s))
        ]
        if unmarked:
            raise RuntimeError(
                "ledger read-back found complete-looking nested batch "
                f"relations with no _SUCCESS marker under {root!r} (e.g. "
                f"{unmarked[0]!r}) and zero committed batches: is "
                "mapreduce.fileoutputcommitter.marksuccessfuljobs "
                "disabled?"
            )
    return ok
