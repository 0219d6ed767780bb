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
filesystem-only stand-in for that commit, and :func:`mutation_lease`
is the stand-in for that format's writer-concurrency control — every
mutator and maintenance fold holds it, so the entry-time crash
recovery (:func:`recover_partition_swaps` and its flat twin) can
safely assume any orphan it finds belongs to a DEAD writer.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame

__all__ = [
    "swap_partition_dirs",
    "recover_partition_swaps",
    "purge_swap_orphans",
    "mutation_lease",
    "open_snapshot",
    "refresh_manifest",
    "resolve_manifest_files",
    "resolve_manifest_schema",
    "MANIFEST_NAME",
]

# store paths whose lease THIS process currently holds, keyed to the
# OWNING THREAD and its re-entry depth — makes the lease re-entrant
# per thread (a maintenance fold holds it around the whole batch; the
# leaf mutator it calls re-enters instead of deadlocking) while a
# SECOND thread of the same process fails loud instead of silently
# sharing the lease (two streaming queries in one driver are exactly
# the concurrent-writer setup the lease exists to block)
_HELD_LEASES: "dict[str, list]" = {}  # key -> [thread ident, depth]
_HELD_LOCK = threading.Lock()

# bound at import so the crash-sweep tests (which monkeypatch
# os.rename to die at every COMMIT rename in turn) don't count the
# lease's staged rename as a commit point: a death there leaves only
# a dead-pid lease, healed on the next entry — no data moved, nothing
# to sweep — and intercepting it would shift every sweep offset
_fs_rename = os.rename


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _lease_holder(lease: str) -> "int | None":
    try:
        with open(f"{lease}/pid") as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


@contextlib.contextmanager
def mutation_lease(path: str):
    """Single-writer guard for store mutations. Every mutator's first
    act is entry-time crash recovery (``recover_partition_swaps`` /
    ``ingest.recover_flat_swaps``), which treats any sibling tmp dir
    as an orphan of a DEAD writer and rolls it back. That is only
    sound if writers never overlap: a second live writer's recovery
    would roll back the first writer's IN-FLIGHT swap while its
    checkpoint goes on to commit — a lost batch with no error, the
    exact failure class the swaps exist to prevent. This lease makes
    the single-writer discipline executable: concurrent mutation
    fails loud instead of corrupting.

    Mechanics: a ``<path>.mutation-lease`` sibling dir holding the
    writer's pid, created fully-formed via staging-dir + atomic
    rename (a half-created lease is never visible). If the lease
    exists and its pid is a LIVE process, raise; if the pid is dead
    (a writer that crashed inside its lease), heal the lease and
    proceed — the entry recovery inside the new lease heals the
    data. Re-entrant within a process, so a maintenance fold can
    hold it around recovery + fold while the leaf mutator re-enters.

    Pid liveness is same-host only — the honest scope for this
    filesystem store, which is the local stand-in for a
    transactional table format whose commit protocol (Iceberg/Delta
    optimistic concurrency) replaces this lease at 100 TB.

    Re-entrancy is scoped to the OWNING THREAD, not the process: a
    second thread of the same process raises the same loud error a
    second process gets (it used to silently share the lease — two
    streaming maintenance loops in one driver would bypass the
    guard entirely, and the first to exit would drop the lease out
    from under the other).
    """
    key = os.path.abspath(path.rstrip("/"))
    me = threading.get_ident()
    with _HELD_LOCK:
        held = _HELD_LEASES.get(key)
        if held is not None:
            if held[0] == me:
                held[1] += 1
                reentered = True
            else:
                raise RuntimeError(
                    f"{path}: store is being mutated by thread "
                    f"{held[0]} of THIS process; a second concurrent "
                    "writer's entry-time recovery would roll back its "
                    "in-flight swap. Run one maintenance loop per "
                    "store (production: a transactional table "
                    "format's commit protocol)."
                )
        else:
            _HELD_LEASES[key] = [me, 1]
            reentered = False
    if reentered:
        try:
            yield
        finally:
            with _HELD_LOCK:
                _HELD_LEASES[key][1] -= 1
        return
    lease = path.rstrip("/") + ".mutation-lease"
    try:
        _sweep_lease_orphans(lease)
        for _ in range(3):
            staging = f"{lease}.stage-{uuid.uuid4().hex[:8]}"
            os.makedirs(staging)
            with open(f"{staging}/pid", "w") as f:
                f.write(str(os.getpid()))
            try:
                _fs_rename(staging, lease)
                break
            except OSError:
                shutil.rmtree(staging, ignore_errors=True)
                holder = _lease_holder(lease)
                if holder is not None and _pid_alive(holder):
                    raise RuntimeError(
                        f"{path}: store is being mutated by live "
                        f"process {holder}; a second concurrent "
                        "writer's entry-time recovery would roll back "
                        "its in-flight swap. Run one maintenance loop "
                        "per store (production: a transactional table "
                        "format's commit protocol)."
                    )
                # Stale lease from a crashed writer: heal it ATOMICALLY
                # by renaming it aside to a unique tombstone — only one
                # healer's rename succeeds; rmtree here would race a
                # faster healer that already healed AND re-acquired,
                # deleting its fresh live lease. The rename is still
                # content-blind, so verify the tombstone holds the dead
                # incarnation we judged stale; if we grabbed a LIVE
                # writer's fresh lease instead, put it back and defer.
                tomb = f"{lease}.tombstone-{uuid.uuid4().hex[:8]}"
                try:
                    _fs_rename(lease, tomb)
                except OSError:
                    continue  # another healer won the rename; retry
                stolen = _lease_holder(tomb)
                if stolen is not None and _pid_alive(stolen):
                    try:
                        _fs_rename(tomb, lease)
                    except OSError:
                        pass  # a third writer landed; tomb stays as
                        # evidence (swept once its pid dies)
                    raise RuntimeError(
                        f"{path}: store is being mutated by live "
                        f"process {stolen} (lease re-acquired during "
                        "heal); deferring."
                    )
                shutil.rmtree(tomb, ignore_errors=True)
        else:
            raise RuntimeError(
                f"{path}: could not acquire mutation lease"
            )
    except BaseException:
        with _HELD_LOCK:
            _HELD_LEASES.pop(key, None)
        raise
    try:
        yield
    finally:
        with _HELD_LOCK:
            _HELD_LEASES.pop(key, None)
        # release only OUR incarnation: if our lease was stolen by a
        # doubly-raced healer and another writer re-acquired, the dir
        # at this path belongs to them — leave it
        if _lease_holder(lease) == os.getpid():
            shutil.rmtree(lease, ignore_errors=True)


def _sweep_lease_orphans(lease: str) -> None:
    """Remove crash junk next to the lease path: ``.stage-*`` dirs a
    writer orphaned between ``makedirs`` and the lease rename (any
    live writer whose staging we remove self-heals — its rename fails
    and its retry loop re-stages), and ``.tombstone-*`` dirs whose
    recorded pid is dead (a live-pid tombstone is the stolen-lease
    evidence case and must survive until that writer exits)."""
    parent = os.path.dirname(lease) or "."
    base = os.path.basename(lease)
    if not os.path.isdir(parent):
        return
    for d in os.listdir(parent):
        full = f"{parent}/{d}"
        if d.startswith(f"{base}.stage-"):
            shutil.rmtree(full, ignore_errors=True)
        elif d.startswith(f"{base}.tombstone-"):
            pid = _lease_holder(full)
            if pid is None or not _pid_alive(pid):
                shutil.rmtree(full, ignore_errors=True)


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
    orphaned tmp (:func:`recover_partition_swaps` rolls that tmp
    back; a bare filesystem has no atomic multi-dir commit —
    production targets a transactional format's REPLACE). A fixed tmp name would let a
    post-crash replay clobber the only surviving copy of a
    half-swapped partition; the uuid suffix closes that window.
    Untouched partition directories are never opened, moved, or
    rewritten — they keep their exact files (pytest-pinned by file
    listing in both stores' test suites).

    Scope note (readers): WRITERS are serialized by
    :func:`mutation_lease` and crashes roll back via
    :func:`recover_partition_swaps`; READERS resolve one committed
    snapshot through the manifest this function refreshes after its
    renames (:func:`refresh_manifest` / :func:`resolve_manifest_files`
    — a probe concurrent with the rename window converges to the
    post-swap snapshot or fails loud, never a mixed listing). What
    remains out of scope on a bare filesystem is multi-mutation
    isolation for long-running readers (a job still reading files a
    LATER mutation retired fails loud on the missing file); at 100 TB
    the transactional format this swap stands in for keeps retired
    files until snapshot expiry.
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
    # reader-visible commit: refresh the manifest BEFORE dropping the
    # tmp — a crash in between leaves an orphan, whose entry-time
    # rollback re-refreshes, so manifest and data never diverge
    refresh_manifest(path, part_col)
    shutil.rmtree(tmp)


MANIFEST_NAME = "_mii_manifest.json"


def refresh_manifest(
    path: str, part_col: str, schema_json: "str | None" = None
) -> dict:
    """Write the store's READER manifest: one atomic JSON file naming
    every live data file per partition, committed via tmp-file +
    rename. Called by every WRITER inside its lease, strictly AFTER
    its partition renames land — so the manifest always describes a
    COMMITTED state, and the single rename is the reader-visible
    commit point.

    Why: the partition-dir swap is crash-safe for writers, but a
    reader that LISTS the store during the rename window sees a mixed
    view — some partitions pre-swap, some post, some absent. Readers
    that resolve through the manifest (:func:`resolve_manifest_files`)
    never list, so they see exactly one committed snapshot or fail
    loud — never a mix. This is the bare-filesystem stand-in for a
    transactional format's snapshot pointer (an Iceberg metadata.json
    at 100 TB), same as the lease stands in for its commit protocol.

    Listing here is safe: the caller holds the mutation lease, so no
    swap is in flight.

    ``schema_json`` (a Spark ``StructType.json()`` string) rides in
    the manifest so a COMMITTED-EMPTY store — every partition taken
    down — stays readable as an empty DataFrame of the right shape
    instead of an unreadable directory (ADVICE r11 #2). Writers that
    hold the DataFrame pass it; refreshes that don't (swap commits,
    entry recovery) carry the prior manifest's schema forward, so
    the schema survives any mutation sequence after the seed
    recorded it.
    """
    import json

    if schema_json is None:
        try:
            with open(f"{path}/{MANIFEST_NAME}") as f:
                schema_json = json.load(f).get("schema")
        except (OSError, ValueError):
            schema_json = None
    parts: dict = {}
    if os.path.isdir(path):
        for d in sorted(os.listdir(path)):
            if not d.startswith(f"{part_col}="):
                continue
            files = sorted(
                fn
                for fn in os.listdir(f"{path}/{d}")
                if not fn.startswith(("_", "."))
            )
            if files:
                parts[d.split("=", 1)[1]] = files
    manifest = {
        "version": uuid.uuid4().hex,
        "part_col": part_col,
        "parts": parts,
    }
    if schema_json is not None:
        manifest["schema"] = schema_json
    tmp = f"{path}/.{MANIFEST_NAME}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    _fs_rename(tmp, f"{path}/{MANIFEST_NAME}")
    return manifest


def resolve_manifest_files(
    path: str,
    part_col: str,
    retries: int = 40,
    wait_sec: float = 0.05,
) -> "list[str] | None":
    """Reader-side atomic snapshot resolution: return the absolute
    data-file paths the manifest names, verified present — one
    committed snapshot, never a mixed listing. Returns ``None`` for a
    manifest-less store (pre-manifest layout: the caller falls back
    to directory reading, accepting the documented listing race) and
    ``[]`` for a committed-empty store (every partition taken down).

    If a named file is missing, a swap is in flight (the writer
    renamed dirs but has not refreshed the manifest yet) or a writer
    died mid-swap: re-read the manifest and re-check, up to
    ``retries``. A completing swap converges (its manifest refresh
    lands and the new snapshot verifies); a crashed one keeps the
    stale manifest until the next mutation's entry recovery rolls the
    data back and refreshes — until then this fails LOUD instead of
    returning a partial view.

    Scope: one consistent snapshot at resolution time. The returned
    paths feed a lazy DataFrame; a mutation committing between
    resolution and the job's file reads surfaces as missing-file
    errors (fail loud). Long-running readers overlapping many
    mutations are the transactional format's job.
    """
    import json
    import time

    for _ in range(retries):
        try:
            with open(f"{path}/{MANIFEST_NAME}") as f:
                manifest = json.load(f)
        except (OSError, ValueError):
            return None
        files = [
            f"{path}/{part_col}={k}/{fn}"
            for k, fns in sorted(manifest["parts"].items())
            for fn in fns
        ]
        if all(os.path.isfile(p) for p in files):
            return files
        time.sleep(wait_sec)
    raise RuntimeError(
        f"{path}: the reader manifest names files that stayed missing "
        f"through {retries} checks — a writer is mid-swap (retry once "
        "it commits) or died mid-swap (any mutator's entry recovery "
        "heals the store and refreshes the manifest)"
    )


def open_snapshot(
    spark,
    path: str,
    part_col: str,
    retries: int = 40,
    wait_sec: float = 0.05,
) -> "tuple[str, object]":
    """Reader-side committed-snapshot OPEN: resolve the manifest and
    return ``(kind, df_or_none)`` where kind is ``"df"`` (DataFrame
    over the verified snapshot), ``"empty"`` (committed-empty store),
    or ``"manifestless"`` (pre-manifest layout — caller falls back to
    directory reading, accepting the documented listing race).

    Why a VERIFIED open and not just ``spark.read.parquet(*files)``:
    Spark checks the explicit paths on the DRIVER (missing files are
    a loud PATH_NOT_FOUND), but the subsequent leaf-file listing runs
    as a PARALLEL JOB above ~32 paths, and that bulk listing SILENTLY
    DROPS any path deleted between the driver check and the executor
    stat ("was it deleted very recently?" is a log warning, not an
    error — regardless of ignoreMissingFiles). A swap racing that
    window hands back a partial FileIndex with no error: the r12
    decade race probe measured a 3,904-file resolve materializing
    1,728 inputFiles and aggregating 45% of the store, silently. So
    after building the DataFrame we compare ``df.inputFiles()``
    against the resolved list and RE-RESOLVE on mismatch — a
    completing swap converges to the post-swap snapshot; a wedged one
    fails loud, same contract as :func:`resolve_manifest_files`.
    """
    import time

    last = None
    for _ in range(retries):
        files = resolve_manifest_files(path, part_col)
        if files is None:
            return ("manifestless", None)
        if not files:
            return ("empty", None)
        try:
            df = spark.read.option("basePath", path).parquet(*files)
            n_indexed = len(df.inputFiles())
        except Exception as e:  # driver-side PATH_NOT_FOUND mid-swap
            if "PATH_NOT_FOUND" not in str(e):
                raise
            last = f"driver existence check: {e}"
            time.sleep(wait_sec)
            continue
        if n_indexed == len(files):
            return ("df", df)
        last = f"file index holds {n_indexed} of {len(files)} resolved files"
        time.sleep(wait_sec)
    raise RuntimeError(
        f"{path}: could not materialize one committed snapshot through "
        f"{retries} attempts — a writer is mid-swap (retry once it "
        f"commits) or died mid-swap (any mutator's entry recovery heals "
        f"the store). Last observation: {last}"
    )


def resolve_manifest_schema(path: str) -> "str | None":
    """The ``StructType.json()`` string the manifest carries, or
    ``None`` for a manifest-less store / a manifest written before
    schemas rode along. Readers use it to materialize a
    COMMITTED-EMPTY store as an empty DataFrame of the committed
    shape (the file-level snapshot has nothing left to infer from)."""
    import json

    try:
        with open(f"{path}/{MANIFEST_NAME}") as f:
            return json.load(f).get("schema")
    except (OSError, ValueError):
        return None


def purge_swap_orphans(path: str) -> "list[str]":
    """Reseed-time crash-artifact purge: delete every orphaned
    ``<path>.tmp-swap-*`` sibling WITHOUT rolling it back. An
    overwrite reseed (``write_index_store`` / ``write_ivf_cells``)
    replaces the store wholesale, so the pre-crash state a
    :func:`recover_partition_swaps` rollback would restore is
    irrelevant — but an orphan that SURVIVES the reseed is a time
    bomb: the next mutator's entry recovery would move the pre-crash
    retired copies in OVER the freshly-seeded partitions, silently
    resurrecting stale data. Called inside the seeding lease, before
    the overwrite. Returns the purged sibling names."""
    base = os.path.basename(path.rstrip("/"))
    parent = os.path.dirname(path.rstrip("/")) or "."
    purged = []
    if not os.path.isdir(parent):
        return purged
    for d in sorted(os.listdir(parent)):
        if d.startswith(f"{base}.tmp-swap-"):
            shutil.rmtree(f"{parent}/{d}", ignore_errors=True)
            purged.append(d)
    return purged


def recover_partition_swaps(path: str, part_col: str) -> "list[str]":
    """Executable crash recovery for orphaned mid-swap tmp dirs — the
    reconciliation :func:`swap_partition_dirs` leaves as a manual
    point, made a routine. Strategy: ROLL BACK to the pre-batch state.
    The swap only runs inside a maintenance batch whose checkpoint
    commits strictly after the swap returns, so a tmp that outlived
    its process belongs to an UNcommitted batch — the stream will
    replay it; restoring the retired copies (and discarding any
    rewritten partitions that already landed) returns the store to
    exactly the state that replay expects.

    Per orphaned ``<path>.tmp-swap-*`` sibling, for every
    ``retired-<part_col>=v`` inside it: the live dir currently holds
    either nothing (crash between rename-aside and rename-in) or the
    new copy (crash after this partition committed but before the
    batch finished) — both roll back by moving the retired copy in.
    Plain ``<part_col>=v`` entries are rewritten copies never renamed
    in; the live dir still holds the old state (or the partition is
    legitimately new), so they are dropped with the tmp. Idempotent
    and safe to call when nothing is orphaned (returns []).

    The streaming maintenance loops call this before every fold, so
    a crash-restart cycle self-heals without an operator in the loop.
    """
    base = os.path.basename(path.rstrip("/"))
    parent = os.path.dirname(path.rstrip("/")) or "."
    recovered = []
    if not os.path.isdir(parent):
        return recovered
    for d in sorted(os.listdir(parent)):
        if not d.startswith(f"{base}.tmp-swap-"):
            continue
        tmp = f"{parent}/{d}"
        for entry in sorted(os.listdir(tmp)):
            if not entry.startswith(f"retired-{part_col}="):
                continue
            v_dir = entry[len("retired-"):]
            live = f"{path}/{v_dir}"
            if os.path.isdir(live):  # the new copy landed: discard it
                shutil.rmtree(live)
            os.rename(f"{tmp}/{entry}", live)
        shutil.rmtree(tmp)
        recovered.append(d)
    if recovered and os.path.isfile(f"{path}/{MANIFEST_NAME}"):
        # the rollback may have undone a state the manifest already
        # described (crash between the manifest refresh and the tmp
        # cleanup) — re-derive it from the healed listing so readers
        # converge instead of failing on retired file names
        refresh_manifest(path, part_col)
    return recovered
