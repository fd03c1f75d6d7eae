"""Stored vector index: the IVF cell assignment persisted as the
table's PARTITION layout, so a probe is a partition-pruned read.

``ann_ivf_exact`` (suites/similarity.py) oracle-verifies the IVF
SEMANTICS in one plan; this module is the storage half of the same
design — the claim its docstring makes ("at 100 TB the chunk table is
written partitioned by cell") realized as operators:

- ``write_ivf_store``: assign each vector its cell, write parquet
  ``partitionBy(cell)`` (clustered first — same small-files discipline
  as operators/ingest.py), and publish the per-cell centroid table
  alongside as the broadcastable routing "index".
- ``probe_ivf_store``: route the query against the (tiny) centroid
  table, then read ONLY the probed cells — the cell predicate reaches
  the scan as a partition filter, so I/O is nprobe/n_cells of the
  corpus no matter how large the corpus grows. Exact re-rank inside
  the probed cells, top-k as a heap merge.

The cell assignment reuses the deterministic quantizer from
``ann_ivf_exact`` so both halves describe one index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import davg
from ..functions.vector import cosine
from .maintenance import _manifest_lock

_WRITER_LOCK = ".writer.lock"
_STORE_MANIFEST = "_store_manifest.json"


def _current_version(path: str) -> int:
    """Version pinned by the store manifest (0 for a legacy or fresh
    store)."""
    import json

    mpath = os.path.join(path, _STORE_MANIFEST)
    if not os.path.exists(mpath):
        return 0
    with open(mpath) as f:
        return int(json.load(f)["current"])


def current_vectors_dir(path: str) -> str:
    """The vector tree readers should scan RIGHT NOW: the manifest's
    pinned version directory (``vectors/v{K}``), or the flat legacy
    ``vectors/`` tree for stores written before versioning. Readers pin
    this once per probe — every file under a published version is
    immutable, so a probe can never observe a half-rewritten cell."""
    vdir = os.path.join(path, "vectors")
    if os.path.exists(os.path.join(path, _STORE_MANIFEST)):
        return os.path.join(vdir, f"v{_current_version(path)}")
    return vdir


def _publish_version(path: str, new_version: int, keep: int = 2) -> None:
    """Atomically flip the manifest to ``new_version`` (tmp + rename),
    then garbage-collect version dirs older than the newest ``keep``.
    Keeping the previous version protects in-flight probes that pinned
    it just before the flip — a reader would have to outlive TWO full
    rewrites to ever see a vanished file."""
    import json
    import shutil

    mpath = os.path.join(path, _STORE_MANIFEST)
    tmp = f"{mpath}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(json.dumps({"current": new_version}))
    os.replace(tmp, mpath)
    vdir = os.path.join(path, "vectors")
    for d in os.listdir(vdir):
        if d.startswith("v") and d[1:].isdigit():
            if int(d[1:]) <= new_version - keep:
                shutil.rmtree(os.path.join(vdir, d), ignore_errors=True)


def _upgrade_legacy_layout(path: str) -> None:
    """One-time migration for stores written before versioning: move
    the flat ``vectors/cell=*`` tree under ``vectors/v0`` and publish a
    manifest. Called only under the writer lock.

    A probe that resolved the flat tree JUST before this runs can see a
    half-moved directory — accepted: the migration triggers only on the
    first purge/compact of a PRE-versioning store, exactly the
    operations whose in-place rewrites could already break concurrent
    legacy readers (that being the defect versioning fixes); every
    store written since builds versioned and never enters this path."""
    vdir = os.path.join(path, "vectors")
    if os.path.exists(os.path.join(path, _STORE_MANIFEST)):
        return
    v0 = os.path.join(vdir, "v0")
    os.makedirs(v0, exist_ok=True)
    for d in os.listdir(vdir):
        if d.startswith("cell="):
            os.rename(os.path.join(vdir, d), os.path.join(v0, d))
    _publish_version(path, 0)


def _hardlink_cell(src_cell_dir: str, dst_cell_dir: str) -> None:
    """Carry an untouched cell into the next version for free: hardlink
    every data file (the local analog of a table format's manifest
    reusing unchanged data files — no bytes copied, no bytes read)."""
    os.makedirs(dst_cell_dir, exist_ok=True)
    for f in os.listdir(src_cell_dir):
        if f.endswith(".parquet"):
            os.link(
                os.path.join(src_cell_dir, f), os.path.join(dst_cell_dir, f)
            )


def _resolve_n_cells(path: str, n_cells: int | None) -> int:
    """The cell count is a STORE property, not a per-call parameter:
    tombstone routing computes cell = id % n_cells, so a caller passing
    a different modulus than the one the store was built with would
    purge the WRONG cells — the tombstoned ids' real cells stay
    untouched, the tombstone table is then cleared, and the 'deleted'
    rows silently resurrect. The value is pinned in store_meta.json at
    router-training time; an explicit argument must match it (legacy
    stores without the file trust the caller)."""
    import json

    meta_path = os.path.join(path, "store_meta.json")
    stored = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            stored = int(json.load(f)["n_cells"])
    if stored is None:
        if n_cells is None:
            raise ValueError(f"store at {path} has no store_meta.json; "
                             "pass n_cells explicitly")
        return n_cells
    if n_cells is not None and n_cells != stored:
        raise ValueError(
            f"n_cells={n_cells} does not match the store's pinned "
            f"n_cells={stored} ({meta_path})"
        )
    return stored


def _writer_lock(path: str):
    """Single-writer critical section for the store's MUTATORS (upsert /
    delete / purge / compact / append). Probes never take it — readers
    see immutable files and at worst miss the newest batch. Without it,
    an append racing a purge/compact rewrite of the same cell can lose
    the appended rows (the rewrite's scan predates them, its dynamic
    overwrite then replaces the partition), and two upserts interleaving
    delete→purge→append can duplicate ids. Same flock primitive as the
    snapshot manifest (kernel-released on crash, no staleness
    heuristic), under its own lock file so store writes and snapshot
    commits don't contend."""
    return _manifest_lock(path, lock_name=_WRITER_LOCK)


def train_ivf_router(
    vectors: DataFrame, path: str, n_cells: int
) -> None:
    """Train and persist the store's ROUTER: per-cell centroids + the
    catalog schema. Split from the vector write because the router's
    lifecycle is different (FAISS/ScaNN semantics): it is trained once
    on a representative corpus, FROZEN while vectors stream in through
    :func:`append_ivf_store`, and only rebuilt by an explicit re-train
    + re-index. Deterministic cell = vec_id % n_cells mirrors
    ann_ivf_exact's quantizer; a trained variant swaps this one
    projection for a broadcast-codebook argmin (see mllib_ivf_ann) —
    everything downstream is identical either way."""
    ivf = vectors.select(
        "vec_id", "embedding", (F.col("vec_id") % n_cells).alias("cell")
    )
    # persist the schema as the store's catalog entry: probes read with
    # it instead of footer-inferring, so opening the store touches NO
    # data files until the pruned scan itself
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "schema.json"), "w") as f:
        f.write(ivf.schema.json())
    # pin the quantizer's modulus as a store property (_resolve_n_cells)
    with open(os.path.join(path, "store_meta.json"), "w") as f:
        f.write(__import__("json").dumps({"n_cells": int(n_cells)}))
    flat = ivf.select("cell", F.posexplode("embedding")).select(
        "cell", F.col("pos").alias("idx"), F.col("col").cast("double").alias("v")
    )
    # decimal-exact means rounded to 6 (same pin as ann_ivf_exact):
    # routing is then bit-reproducible on any engine and any row order
    cent = (
        flat.groupBy("cell", "idx")
        .agg(F.round(davg(F.col("v")), 6).alias("cv"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "cv"))),
                lambda x: x["cv"],
            ).alias("centroid")
        )
    )
    cent.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )


def write_ivf_store(
    vectors: DataFrame, path: str, n_cells: int
) -> None:
    """Batch build: train the router on ``vectors`` and write them all,
    partitioned by cell. (Incremental growth instead uses
    :func:`train_ivf_router` once + :func:`append_ivf_store` per batch.)

    Locked like every other mutator. Rebuilding an existing LIVE store
    in place still drops its version history (readers pinned to an old
    version lose their files) — production rebuilds into a fresh path
    and repoints; this operator is the initial-build/testing form.
    """
    import shutil

    train_ivf_router(vectors, path, n_cells)
    ivf = vectors.select(
        "vec_id", "embedding", (F.col("vec_id") % n_cells).alias("cell")
    )
    with _writer_lock(path):
        # fresh build = fresh version history
        shutil.rmtree(os.path.join(path, "vectors"), ignore_errors=True)
        ivf.repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(os.path.join(path, "vectors", "v0"))
        _publish_version(path, 0)


def append_ivf_store(
    new_vectors: DataFrame, path: str, n_cells: int | None = None
) -> None:
    """Incremental index maintenance: route a NEW batch into the
    existing cell layout and append — cost scales with the batch, not
    the store (a full ``write_ivf_store`` rebuild re-shuffles the whole
    corpus for every ingest, which no production pipeline survives).

    The cell assignment is the store's frozen router (deterministic
    here; a trained store freezes its centroid codebook between
    re-trainings the same way — FAISS/ScaNN semantics: adding vectors
    never moves existing ones), so centroids are NOT recomputed: an
    append touches only ``vectors/cell=*/`` with new files. Parquet's
    append mode writes fresh files per partition directory — existing
    files are never rewritten, so concurrent probes stay consistent
    (they read a file listing; the worst case is missing the newest
    batch, never torn data). Periodic :func:`compact_ivf_cells` folds
    the accumulated small files.

    The batch is CAST to the store's catalog schema (schema.json)
    before writing: mixed physical types across files (float vs double
    arrays) would poison every subsequent scan of the partition.

    Takes the store writer lock: an append racing a purge/compact
    rewrite of the same cell would otherwise vanish (the rewrite's scan
    predates it; its partition overwrite then replaces the directory)."""
    n_cells = _resolve_n_cells(path, n_cells)
    with _writer_lock(path):
        _append_unlocked(new_vectors, path, n_cells)


def _route_and_cast(
    new_vectors: DataFrame, path: str, n_cells: int
) -> DataFrame:
    """Assign each incoming row its frozen-router cell and conform it to
    the store's catalog schema (mixed physical types across files —
    float vs double arrays — would poison every later scan)."""
    ivf = new_vectors.select(
        "vec_id", "embedding", (F.col("vec_id") % n_cells).alias("cell")
    )
    schema_path = os.path.join(path, "schema.json")
    if os.path.exists(schema_path):
        from pyspark.sql.types import StructType

        with open(schema_path) as f:
            stored = StructType.fromJson(__import__("json").loads(f.read()))
        ivf = ivf.select(
            *[F.col(f.name).cast(f.dataType) for f in stored.fields]
        )
    return ivf


def _append_unlocked(
    new_vectors: DataFrame, path: str, n_cells: int
) -> None:
    # append INTO the current version: only adds files, so readers that
    # pinned this version stay consistent (worst case: miss the batch)
    _route_and_cast(new_vectors, path, n_cells).repartition(
        "cell"
    ).write.mode("append").partitionBy("cell").parquet(
        current_vectors_dir(path)
    )


def delete_from_ivf_store(
    spark: SparkSession, path: str, vec_ids: list[int]
) -> None:
    """Logical delete: append the ids to the store's tombstone table.
    O(deleted ids) — no data file is touched; probes anti-join the
    (tiny, broadcast) tombstone set until :func:`purge_ivf_tombstones`
    rewrites the affected cells. The same write-ahead-delete shape
    every immutable-file table format uses (delete vectors / tombstone
    files), because in-place mutation of columnar files is not a thing.

    Locked: a tombstone landing between a purge's tombstone read and
    its table clear would be silently dropped."""
    if not vec_ids:
        return
    with _writer_lock(path):
        _delete_unlocked(spark, path, vec_ids)


def _delete_unlocked(
    spark: SparkSession, path: str, vec_ids: list[int]
) -> None:
    _delete_df_unlocked(
        spark.createDataFrame([(int(v),) for v in vec_ids], "vec_id long"),
        path,
    )


def _delete_df_unlocked(tomb_df: DataFrame, path: str) -> None:
    """DataFrame-native tombstone write: the id set never touches the
    driver, so a multi-million-row upsert batch tombstones at dataset
    scale (the list overload above is the explicit-API convenience for
    user-supplied delete lists, which are inherently small)."""
    tomb_df.select(F.col("vec_id").cast("long")).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(path, "tombstones"))


def _tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    tdir = os.path.join(path, "tombstones")
    if not os.path.isdir(tdir):
        return None
    return spark.read.schema("vec_id long").parquet(tdir)


def upsert_ivf_store(
    spark: SparkSession, new_vectors: DataFrame, path: str,
    n_cells: int | None = None,
) -> None:
    """Keyed upsert (the reference's last-write-wins id semantics,
    main.py:163,172, in the stored index): MERGE-ON-WRITE — one
    versioned rewrite of the affected cells drops the old rows under
    the incoming ids (plus any outstanding tombstones) and folds the
    replacements into the same write. Cost ~ the affected cells plus
    the batch, scanned ONCE; the store is never rebuilt. A high-churn
    deployment would instead version rows with an ingest epoch and
    resolve last-write-wins at probe time — this is the
    compact-on-write variant.

    A batch carrying the same vec_id twice collapses to ONE row before
    the merge (the reference's dict-keyed upsert can't hold two values
    under one id) — last row in the batch's encounter order wins,
    mirroring dict insertion semantics.

    The rewrite holds the writer lock: two interleaved upserts of the
    same id could otherwise both fold their replacement in after both
    dropped (duplicate rows under one id), and a concurrent append
    could be erased by this upsert's cell rewrite. Crash-atomic: the
    batch applies entirely at the manifest flip or not at all (the old
    tombstone→purge→append sequence could crash after hiding the old
    rows but before appending the replacements).

    The id set never materializes on the driver: the deduped batch is
    STAGED to parquet once (one job, cost ~ the batch) and the drop
    set / replacement rows both read the staged files — so a 100M-row
    upsert holds nothing in driver memory and compiles no giant
    IN-list into any plan (the rewrite anti-joins the drop set)."""
    import shutil
    import uuid

    w = Window.partitionBy("vec_id").orderBy(F.col("__seq").desc())
    deduped = (
        new_vectors.withColumn("__seq", F.monotonically_increasing_id())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__seq", "__rn")
    )
    # private per-CALL staging dir (uuid, not pid: two threads of one
    # process upserting concurrently must not share it)
    staging = os.path.join(path, f".upsert_staging.{uuid.uuid4().hex}")
    deduped.write.mode("overwrite").parquet(staging)
    try:
        batch = spark.read.parquet(staging)
        if batch.isEmpty():
            return
        n_cells = _resolve_n_cells(path, n_cells)
        with _writer_lock(path):
            drop = batch.select("vec_id")
            tomb = _tombstones(spark, path)
            if tomb is not None:
                # fold outstanding logical deletes into the same
                # rewrite (their cells are rewritten anyway if they
                # overlap; disjoint ones ride along at one extra
                # cell-scan each, and the tombstone table empties).
                # No distinct(): the anti-join and the distinct-cell
                # projection both tolerate duplicate ids for free
                drop = drop.unionByName(tomb)
            _rewrite_cells_unlocked(
                spark, path, n_cells, drop, add_batch=batch
            )
            if tomb is not None:
                shutil.rmtree(
                    os.path.join(path, "tombstones"), ignore_errors=True
                )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def purge_ivf_tombstones(
    spark: SparkSession, path: str, n_cells: int | None = None
) -> list[int]:
    """Physical delete: rewrite ONLY the cells that contain tombstoned
    ids (cell = the store's frozen routing of the id) into a NEW store
    version, dropping those rows, then clear the tombstone table. Scan
    cost ~ the affected cells, never the store. Returns the rewritten
    cell ids.

    Versioned rewrite (the table-format pattern): affected cells'
    survivors are written under ``vectors/v{K+1}``, every untouched
    cell's files are HARDLINKED across (no bytes read or copied), and
    the manifest flips atomically — a concurrent probe either pinned
    v{K} (still fully intact; the previous version is retained) or pins
    v{K+1}. Fully-tombstoned cells simply have no directory in the new
    version — the resurrection hazard of an in-place dynamic overwrite
    cannot exist here.

    Locked (rewrite + tombstone clear must exclude appends/deletes)."""
    n_cells = _resolve_n_cells(path, n_cells)
    with _writer_lock(path):
        return _purge_unlocked(spark, path, n_cells)


def _purge_unlocked(
    spark: SparkSession, path: str, n_cells: int
) -> list[int]:
    import shutil

    tomb = _tombstones(spark, path)
    if tomb is None:
        return []
    cells = _rewrite_cells_unlocked(spark, path, n_cells, tomb)
    shutil.rmtree(os.path.join(path, "tombstones"), ignore_errors=True)
    return cells


def _rewrite_cells_unlocked(
    spark: SparkSession,
    path: str,
    n_cells: int,
    drop_ids: DataFrame,
    add_batch: DataFrame | None = None,
) -> list[int]:
    """The versioned-rewrite core shared by purge and upsert: in ONE
    pass over the affected cells, drop every ``drop_ids`` row and (for
    upserts) fold ``add_batch`` rows into the same write — survivors
    and replacements land together in ``vectors/v{K+1}``, untouched
    cells hardlink across, the manifest flips atomically.

    Only the DISTINCT CELL list comes to the driver — bounded by
    n_cells (a store property), never by the drop count. The ids stay
    a DataFrame end-to-end: a rewrite after a 100M-row delete holds
    ~n_cells ints in driver memory and compiles no IN-list plan."""
    import shutil

    cells = sorted(
        r.cell
        for r in drop_ids.select(
            (F.col("vec_id") % n_cells).cast("int").alias("cell")
        )
        .distinct()
        .collect()
    )
    if not cells:
        return []
    _upgrade_legacy_layout(path)
    from pyspark.sql.types import StructType

    with open(os.path.join(path, "schema.json")) as f:
        schema = StructType.fromJson(__import__("json").loads(f.read()))
    k = _current_version(path)
    src = os.path.join(path, "vectors", f"v{k}")
    dst = os.path.join(path, "vectors", f"v{k + 1}")
    shutil.rmtree(dst, ignore_errors=True)  # crashed prior attempt
    vecs = spark.read.schema(schema).parquet(src)
    out = (
        vecs.filter(F.col("cell").isin(cells))  # partition-pruned scan
        # drop as an anti-join — no driver id list, no compiled
        # IN-list plan. No broadcast HINT on purpose: probes broadcast
        # because tombstones are tiny between purges, but the rewrite
        # is exactly where a huge delete/upsert batch lands — AQE picks
        # broadcast when the table is small and shuffles when it isn't
        .join(drop_ids.select("vec_id"), "vec_id", "left_anti")
    )
    if add_batch is not None:
        # every add row's cell is in `cells` by construction (the
        # caller's drop set contains the batch ids), so the union
        # cannot leak rows into a cell the hardlink loop also copies
        out = out.unionByName(_route_and_cast(add_batch, path, n_cells))
    out.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(dst)
    for d in os.listdir(src):
        if d.startswith("cell=") and int(d.split("=")[1]) not in cells:
            _hardlink_cell(os.path.join(src, d), os.path.join(dst, d))
    _publish_version(path, k + 1)
    return cells


def compact_ivf_cells(
    spark: SparkSession,
    path: str,
    max_files_per_cell: int = 4,
) -> dict:
    """Fold the small files incremental appends accumulate, ONLY in the
    cells that need it: per-cell file counts come from the directory
    listing (no data read), each offending cell is rewritten by a scan
    of that cell alone into the NEXT store version, and every other
    cell's files hardlink across untouched (same versioned-rewrite
    shape as the purge — concurrent probes keep their pinned version).
    Returns {cell: n_files_before} for the rewritten cells. Scan cost ~
    size of the compacted cells, never the store.

    Locked: the rewrite must not race an append into a compacting cell
    (the append's files would be replaced by a scan that never saw
    them)."""
    with _writer_lock(path):
        return _compact_unlocked(spark, path, max_files_per_cell)


def _compact_unlocked(
    spark: SparkSession, path: str, max_files_per_cell: int
) -> dict:
    import shutil

    _upgrade_legacy_layout(path)
    k = _current_version(path)
    src = os.path.join(path, "vectors", f"v{k}")
    counts = {
        int(d.split("=")[1]): sum(
            1 for f in os.listdir(os.path.join(src, d)) if f.endswith(".parquet")
        )
        for d in os.listdir(src)
        if d.startswith("cell=")
    }
    fat = {c: n for c, n in counts.items() if n > max_files_per_cell}
    if not fat:
        return {}
    from pyspark.sql.types import StructType

    with open(os.path.join(path, "schema.json")) as f:
        schema = StructType.fromJson(__import__("json").loads(f.read()))
    dst = os.path.join(path, "vectors", f"v{k + 1}")
    shutil.rmtree(dst, ignore_errors=True)  # crashed prior attempt
    vecs = spark.read.schema(schema).parquet(src)
    (
        vecs.filter(F.col("cell").isin(list(fat)))  # partition-pruned scan
        .repartition("cell")  # one file per rewritten cell
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(dst)
    )
    for d in os.listdir(src):
        if d.startswith("cell=") and int(d.split("=")[1]) not in fat:
            _hardlink_cell(os.path.join(src, d), os.path.join(dst, d))
    _publish_version(path, k + 1)
    return fat


def probe_ivf_store(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    nprobe: int,
    k: int,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Top-k cosine search reading ONLY the probed cells.

    The centroid table (n_cells rows) routes the query; the resulting
    cell ids become an IN-filter on the partitioned vector table, which
    Spark turns into partition pruning at the scan — the probe's I/O is
    nprobe partitions regardless of corpus size.
    """
    scored = _scored_candidates(spark, path, query_vec, nprobe, exclude_vec_id)
    return (
        scored.orderBy(F.desc("raw"), "vec_id")  # raw order: exact tie cut
        .limit(k)
        .select("vec_id", "cell", F.round("raw", 6).alias("score"))
    )


def _scored_candidates(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    nprobe: int,
    exclude_vec_id: int | None,
) -> DataFrame:
    """Shared probe prologue for top-k and range search: route against
    the centroid table, validate the query dimension, pin ONE published
    store version (immutable files, retained through the next rewrite),
    apply the tombstone anti-join, and score the probed cells —
    returning (vec_id, cell, raw)."""
    from pyspark.sql.types import StructType

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    with open(os.path.join(path, "schema.json")) as f:
        schema = StructType.fromJson(__import__("json").loads(f.read()))
    cent = spark.read.parquet(os.path.join(path, "centroids"))
    routed = (
        cent.select(
            "cell",
            F.size("centroid").alias("dim"),
            cosine(F.col("centroid"), q).alias("cs"),
        )
        .orderBy(F.desc("cs"), "cell")
        .limit(nprobe)
        .collect()
    )
    # a wrong-length query would zip_with-pad to null scores and return
    # arbitrary rows — fail loudly instead (free: centroids are already
    # collected for routing)
    if routed and routed[0].dim != len(query_vec):
        raise ValueError(
            f"query vector has {len(query_vec)} dims, store has "
            f"{routed[0].dim}"
        )
    cells = [r.cell for r in routed]
    vecs = spark.read.schema(schema).parquet(current_vectors_dir(path))
    if exclude_vec_id is not None:
        vecs = vecs.filter(F.col("vec_id") != exclude_vec_id)
    tomb = _tombstones(spark, path)
    if tomb is not None:
        # logical deletes: tiny tombstone set, broadcast anti-join
        vecs = vecs.join(F.broadcast(tomb), "vec_id", "left_anti")
    return vecs.filter(F.col("cell").isin(cells)).select(
        "vec_id", "cell", cosine(F.col("embedding"), q).alias("raw")
    )


def probe_ivf_range(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    nprobe: int,
    min_score: float,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Range search over the stored index: every vector in the probed
    cells whose cosine reaches ``min_score`` — the score_threshold
    surface, same partition-pruned I/O as the top-k probe but with no
    result-size bound, so no heap: a scored filter over nprobe cells.
    (Recall is bounded by routing exactly as for top-k probes; raising
    nprobe trades I/O for radius coverage.)"""
    scored = _scored_candidates(spark, path, query_vec, nprobe, exclude_vec_id)
    return (
        scored.filter(F.col("raw") >= min_score)
        .select("vec_id", "cell", F.round("raw", 6).alias("score"), "raw")
        .orderBy(F.desc("raw"), "vec_id")
        .drop("raw")
    )
