"""Orphan inspection and cleanup after crashed maintenance jobs.

The maintenance lock (``lake/lock.py``) deliberately stays held when a
rewrite dies mid-flight, and the swap pattern both rewrite jobs use
(write ``_compacting__<dir>`` / ``_rollback__<dir>``, delete, rename)
leaves those tmp directories behind on a crash.  The "_" prefix keeps
Hadoop readers from scanning leftovers (a visible orphan with junk part
files would fail every table read), but they still hold disk.  This module is the
"inspect then clean" half of that contract: :func:`find_orphans` reports
everything a crashed job can leave (tmp rewrite dirs, truncated
``.tmp`` control files under ``_epochs``), and :func:`vacuum_lake`
removes them — under the maintenance lock, so it can never race a LIVE
job whose tmp dir is about to be renamed into place, and never runs
while a crashed job's lock is still held un-inspected.

Orphans are safe to delete by construction: a ``_compacting__*`` /
``_rollback__*`` dir is only ever referenced by the rename that would
have consumed it, and a ``.tmp`` control file is below the atomic-publish
rename in ``LakeFs.write_text`` — no committed state points at either.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .fsutil import LakeFs
from .lock import maintenance_lock

_TMP_DIR_PREFIXES = ("_compacting__", "_rollback__")


def find_orphans(spark: SparkSession, root: str) -> dict[str, list[str]]:
    """{"tmp_dirs": [...], "tmp_files": [...]} of crash leftovers under
    ``root`` (paths relative to the lake root).  Read-only."""
    lfs = LakeFs(spark, root)
    tmp_dirs: list[str] = []
    tmp_files: list[str] = []
    for d in lfs.list_dirs(root):
        if d.startswith(_TMP_DIR_PREFIXES):
            tmp_dirs.append(d)
            continue
        if d.startswith(("_checkpoint", "_epochs")):
            continue
        for sub in lfs.list_dirs(os.path.join(root, d)):
            if sub.startswith(_TMP_DIR_PREFIXES):
                tmp_dirs.append(f"{d}/{sub}")
    for f in lfs.list_files(os.path.join(root, "_epochs")):
        if f.endswith(".tmp"):
            tmp_files.append(f"_epochs/{f.rsplit('/', 1)[-1]}")
    return {"tmp_dirs": sorted(tmp_dirs), "tmp_files": sorted(tmp_files)}


def vacuum_lake(spark: SparkSession, root: str) -> dict[str, list[str]]:
    """Remove every orphan :func:`find_orphans` reports, plus superseded
    generation data left by deferred-vacuum maintenance swaps
    (``lake/generations.py``); returns what was removed.  Holds the
    maintenance lock for the scan AND the deletes — a held lock (live
    job, or crashed job not yet inspected) makes this refuse rather than
    delete a tmp dir that is about to be renamed into place.  Like any
    generation vacuum, run when no reader is mid-query over the OLD
    snapshot."""
    from .generations import vacuum_superseded

    with maintenance_lock(spark, root, owner="vacuum_lake"):
        orphans = find_orphans(spark, root)
        lfs = LakeFs(spark, root)
        for d in orphans["tmp_dirs"]:
            lfs.delete_recursive(os.path.join(root, d))
        for f in orphans["tmp_files"]:
            lfs.delete(os.path.join(root, f))
        superseded: list[str] = []
        for d in lfs.list_dirs(root):
            if d.startswith(("_", ".")):
                continue
            superseded.extend(
                vacuum_superseded(spark, os.path.join(root, d))
            )
        orphans["superseded"] = sorted(superseded)
    return orphans
