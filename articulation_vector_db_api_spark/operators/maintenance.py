"""Table-maintenance operators: versioned snapshots (time travel) and
small-file compaction.

The reference has no table format at all — storage is Pinecone's
managed index (/root/reference/main.py:21-44), so versioning and file
layout are its provider's problem. A 100 TB parquet warehouse must own
both:

- **Snapshots**: every write lands in a fresh ``v=N`` directory plus a
  tiny JSON manifest naming the current version. Readers pin a version
  (time travel) or take the latest; writers never mutate a published
  directory, so readers are never torn — the poor-man's core of
  Delta/Iceberg's log, enough for reproducible training runs
  ("the corpus as of v3").
- **Compaction**: streaming/incremental ingest leaves thousands of
  small files; scan cost at scale is dominated by per-file overhead
  (open + footer + scheduling). Bin-pack rewrite into ~target-size
  files as a NEW snapshot — compaction is just another versioned
  write, so it is safe under concurrent readers and fully rollback-able.

Both operators are pure DataFrame writes — no driver-side row loops.

Manifest and file listing use the local filesystem (os.listdir /
os.path.getsize / os.replace): correct for local[*] and NFS-backed
warehouses. An object-store deployment would route these through the
Hadoop FileSystem API (manifest flip = one conditional PUT) — the
publish protocol itself (data first, then an atomic manifest swap) is
unchanged.
"""

from __future__ import annotations

import contextlib
import json
import math
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_snapshot_manifest.json"
_LOCK = ".manifest.lock"


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, _MANIFEST)


@contextlib.contextmanager
def _manifest_lock(
    table_path: str,
    timeout: float = 30.0,
    lock_name: str = _LOCK,
):
    """Exclusive writer lock via ``flock(LOCK_EX)`` on a permanent lock
    file. The kernel releases a crashed holder's lock automatically, so
    there is no staleness heuristic and therefore no stale-break race —
    the O_EXCL + age-break predecessor had a window (rename-aside of a
    lock a fresh holder had just re-created) where two writers could
    enter the critical section. ``timeout`` bounds the wait for a live
    holder.

    The lock FILE is never unlinked: with flock, mutual exclusion lives
    on the inode, and an unlink-on-release scheme lets a waiter that
    already opened the old inode lock it while later arrivals lock a
    new one — two holders again. A zero-byte ``.manifest.lock`` at the
    table root is the (documented) cost.

    ``lock_name`` makes the primitive reusable for other single-writer
    critical sections (the IVF store's writer lock) without the two
    lock domains contending on one file. Scope: local/POSIX
    filesystems (the test deployment). Over NFS flock is emulated and
    over object stores there are no files — a cluster deployment swaps
    this for the storage layer's conditional-put/lease, behind the same
    context-manager seam."""
    import fcntl

    os.makedirs(table_path, exist_ok=True)
    lock = os.path.join(table_path, lock_name)
    fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    deadline = time.monotonic() + timeout
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"manifest lock held too long: {lock}"
                    ) from None
                time.sleep(0.05)
        # owner breadcrumb for debugging; not part of the protocol
        os.ftruncate(fd, 0)
        os.write(fd, str(os.getpid()).encode())
        yield
    finally:
        with contextlib.suppress(OSError):
            fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def read_manifest(table_path: str) -> dict:
    p = _manifest_path(table_path)
    if not os.path.exists(p):
        return {"current": 0, "versions": {}}
    with open(p) as f:
        return json.load(f)


def write_snapshot(
    df: DataFrame,
    table_path: str,
    note: str = "",
    batch_id: int | None = None,
) -> int:
    """Publish ``df`` as the next table version; returns the version.

    Concurrent-writer protocol (optimistic concurrency over a plain
    filesystem — a simplified cousin of a real table format's commit
    log, not a replacement for one):

    1. WRITE data into a private ``.tmp-*`` directory. Nothing is
       published; a crash here leaves cleanup garbage, never a torn
       table.
    2. CLAIM+PUBLISH in one atomic op: ``rename(.tmp-*, v=N)``. The
       rename fails when ``v=N`` already exists (published versions
       are non-empty directories), so a loser bumps to N+1 and
       retries. Because the claim IS the publish, no competing writer
       can ever observe — or recreate — a half-claimed directory, the
       flaw of the earlier mkdir-claim-then-overwrite protocol whose
       data write deleted its own claim.
    3. MERGE-THEN-FLIP the manifest under an ``O_CREAT|O_EXCL`` lock
       file: the re-read/merge/replace runs exclusively, so two
       committers cannot interleave read-modify-write and drop each
       other's ``versions`` entries or regress ``current``. A crash
       mid-dump leaves the previous manifest live; a crash while
       holding the lock is healed by lock-age takeover.
    """
    os.makedirs(table_path, exist_ok=True)
    tmp_dir = os.path.join(table_path, f".tmp-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(tmp_dir)
    n_files = len([f for f in os.listdir(tmp_dir) if f.endswith(".parquet")])
    version = int(read_manifest(table_path)["current"]) + 1
    while True:
        vdir = os.path.join(table_path, f"v={version}")
        try:
            os.rename(tmp_dir, vdir)  # atomic claim + publish
            break
        except OSError:
            if not os.path.exists(vdir):
                raise  # not a lost claim race — surface it
            version += 1
    with _manifest_lock(table_path):
        man = read_manifest(table_path)  # re-read UNDER the lock
        entry = {"path": vdir, "note": note, "n_files": n_files}
        if batch_id is not None:
            entry["batch_id"] = int(batch_id)
        man["versions"][str(version)] = entry
        man["current"] = max(int(man["current"]), version)
        tmp = _manifest_path(table_path) + f".tmp.{version}"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, _manifest_path(table_path))
    return version


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read the table at a pinned version (time travel) or the latest."""
    man = read_manifest(table_path)
    v = int(man["current"]) if version is None else int(version)
    if str(v) not in man["versions"]:
        raise ValueError(f"version {v} not in {sorted(man['versions'])}")
    return spark.read.parquet(man["versions"][str(v)]["path"])


def streaming_snapshot_sink(table_path: str):
    """Exactly-once streaming ingest into the versioned table: a
    ``foreachBatch`` callback committing each micro-batch as a snapshot
    version stamped with its batch id.

    Spark's foreachBatch contract is AT-LEAST-once — after a failure
    the last batch re-delivers with the SAME batch id — so the commit
    is made idempotent on that id: a batch id already present in the
    manifest is skipped, and the re-delivery becomes a no-op. Combined
    with the atomic claim+publish of :func:`write_snapshot`, the table
    holds each micro-batch exactly once, which is the end-to-end
    guarantee a checkpointed stream + idempotent sink buys (the same
    protocol Delta's txn-version-per-streamId implements).

    The table accumulates as a LOG of batch-versions — read the union
    with :func:`read_snapshot_log`, or any single batch with
    :func:`read_snapshot` (time travel over ingest history)."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        committed = {
            v.get("batch_id")
            for v in read_manifest(table_path)["versions"].values()
        }
        if int(batch_id) in committed:
            return  # re-delivered batch: already durable, skip
        write_snapshot(
            batch_df,
            table_path,
            note=f"stream batch {batch_id}",
            batch_id=batch_id,
        )

    return commit


def read_snapshot_log(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """The ACCUMULATED table a streaming-ingested snapshot log holds:
    the union of every version directory up to ``version`` (default
    current). Listing cost is manifest-sized; the scan unions parquet
    directories without rewriting anything — the log IS the table.

    ``merge_schema=True`` enables add-column schema evolution across
    versions: Spark's parquet schema merge unifies the per-version
    schemas and null-fills columns absent from older versions (the
    read pays one footer per file — at scale, evolve rarely and let
    compaction rewrite old versions into the current schema)."""
    man = read_manifest(table_path)
    upto = int(man["current"]) if version is None else int(version)
    paths = [
        v["path"]
        for k, v in sorted(man["versions"].items(), key=lambda kv: int(kv[0]))
        if int(k) <= upto
    ]
    if not paths:
        raise ValueError(f"no versions <= {upto} in {table_path}")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def compact_snapshot(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Bin-pack the current snapshot into ~target-size files, published
    as a new version. Sizing reads the CURRENT files' total bytes (the
    only cheap, exact signal) and coalesces — no shuffle: compaction
    must not pay a repartition of the whole table just to merge files.
    Returns the new version."""
    man = read_manifest(table_path)
    cur = man["versions"][str(man["current"])]["path"]
    total_bytes = sum(
        os.path.getsize(os.path.join(cur, f))
        for f in os.listdir(cur)
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(cur)
    return write_snapshot(
        df.coalesce(n_files), table_path, note=f"compaction -> {n_files} files"
    )


def vacuum_snapshots(
    table_path: str, keep_last: int = 2, force: bool = False
) -> list[int]:
    """Retention vacuum: retire every version except the newest
    ``keep_last``, removing both their manifest entries and their data
    directories. Returns the retired version numbers.

    Ordering is the safety argument: manifest entries are removed
    FIRST, under the manifest lock (so no new reader can resolve a
    retired version), and the data directories are deleted only AFTER
    the manifest flip — a crash between the two leaves orphan
    directories (re-vacuumable garbage), never a manifest entry
    pointing at deleted data. Readers that pinned a retired version's
    path BEFORE the vacuum may break mid-scan: the retention window is
    therefore a contract — keep_last × commit-interval must exceed the
    longest reader lifetime, exactly Delta/Iceberg's VACUUM rule.

    Log-table guard: for accumulated-LOG tables
    (:func:`streaming_snapshot_sink`), old versions ARE the table
    contents — their manifest entries carry ``batch_id``, which makes
    the misuse detectable, so it is REFUSED rather than documented:
    retiring any batch-stamped version raises unless ``force=True``.
    The sanctioned path is compact/fold the log into a plain snapshot
    first, then vacuum the superseded batch versions with ``force``
    (their rows now live in the current version). ``force`` itself
    still verifies that contract: if EVERY retained version is also
    batch-stamped the log was never compacted and the retired rows
    would live nowhere else, so a raw-log force-vacuum is refused
    too."""
    import shutil

    if keep_last < 1:
        # keep_last=0 would retire the CURRENT version and leave the
        # manifest's `current` dangling (table permanently unreadable);
        # negatives slice versions[:-keep_last] into the OPPOSITE of
        # retention. Both are always caller bugs — reject them.
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")

    retired: list[int] = []
    retired_paths: list[str] = []
    with _manifest_lock(table_path):
        man = read_manifest(table_path)
        versions = sorted(int(v) for v in man["versions"])
        cut = versions[:-keep_last]
        logged = [
            v
            for v in cut
            if man["versions"][str(v)].get("batch_id") is not None
        ]
        if logged and not force:
            raise ValueError(
                "vacuum_snapshots would retire batch-stamped log "
                f"versions {logged} of {table_path}: an accumulated "
                "snapshot log's old versions are table CONTENT, not "
                "superseded snapshots. Compact the log into a plain "
                "snapshot first, then pass force=True."
            )
        if logged and force:
            # force is the POST-compaction path: at least one retained
            # version must be a plain (fold) snapshot holding the
            # retired batches' rows. Force-vacuuming a raw, never-
            # compacted log destroys data — refuse that too.
            kept = versions[-keep_last:]
            if all(
                man["versions"][str(v)].get("batch_id") is not None
                for v in kept
            ):
                raise ValueError(
                    "vacuum_snapshots(force=True) on a never-compacted "
                    f"log {table_path}: every retained version "
                    f"{kept} is still batch-stamped, so the retired "
                    "batches' rows live nowhere else. Run "
                    "compact_snapshot first."
                )
        for v in cut:
            entry = man["versions"].pop(str(v))
            retired.append(v)
            retired_paths.append(entry["path"])
        tmp = _manifest_path(table_path) + ".tmp.vacuum"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, _manifest_path(table_path))
    for p in retired_paths:  # AFTER the flip: crash leaves orphans only
        shutil.rmtree(p, ignore_errors=True)
    return retired
