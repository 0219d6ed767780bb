"""Shared commit scaffolding for partition-dir-swapped stores.

Both stored states — the IVF embedding cell store (partition col
``cell``, ``operators/similarity.py``) and the term-hash-bucketed
text index store (partition col ``bucket``,
``operators/inverted_index.py``) — maintain themselves by rewriting
ONLY the partitions a batch touches. This module owns the one piece
they share: the crash-safe directory swap that commits such a
rewrite on a bare filesystem.

At 100 TB the same bodies run against a transactional table format
(Iceberg/Delta partition-level REPLACE); the swap is the
filesystem-only stand-in for that commit.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

__all__ = ["swap_partition_dirs"]


def swap_partition_dirs(
    path: str,
    remaining: DataFrame,
    part_col: str,
    affected: "list[int]",
) -> None:
    """Crash-safe commit for partition-level store rewrites
    (delete/compact): write ``remaining`` ``partitionBy(part_col)``
    into a per-call-UNIQUE tmp dir, then per affected partition move
    the live dir ASIDE into the tmp before moving the rewritten dir
    in — nothing is unlinked until both renames landed, so a kill at
    any point leaves every row either live or intact inside the
    orphaned tmp (the manual reconciliation point; a bare filesystem
    has no atomic multi-dir commit — production targets a
    transactional format's REPLACE). A fixed tmp name would let a
    post-crash replay clobber the only surviving copy of a
    half-swapped partition; the uuid suffix closes that window.
    Untouched partition directories are never opened, moved, or
    rewritten — they keep their exact files (pytest-pinned by file
    listing in both stores' test suites).
    """
    tmp = path.rstrip("/") + f".tmp-swap-{uuid.uuid4().hex[:8]}"
    remaining.write.mode("overwrite").partitionBy(part_col).parquet(tmp)
    for v in affected:
        old = f"{path}/{part_col}={v}"
        new = f"{tmp}/{part_col}={v}"
        if os.path.isdir(old):
            os.rename(old, f"{tmp}/retired-{part_col}={v}")
        if os.path.isdir(new):  # absent when the partition lost every row
            os.rename(new, old)
    shutil.rmtree(tmp)
