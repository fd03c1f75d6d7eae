"""Incrementally-maintained materialized rollup (mergeable partial
aggregates over the snapshot log).

The reference recomputes its one statistic from scratch on every call
(/stats delegates a full index describe, /root/reference/main.py:240,
350). At 100 TB a dashboard that re-scans the corpus per refresh is
dead on arrival; the standard fix is a materialized view maintained
incrementally: every ingested batch contributes a tiny PARTIAL
aggregate, and reads merge partials — never raw rows.

Spark-first shape:

- ``rollup_partial``: one ``groupBy(keys)`` over the batch producing
  algebraic partials — count / sum / min / max, avg as (sum, count),
  approx-distinct as portable HLL registers (bucket→max-rank map, the
  first-principles sketch of ``agg_hll_portable_registers``,
  suites/relational.py — Flajolet et al. 2007). Cost ∝ batch.
- ``refresh_rollup``: publish the batch's partials as the next version
  of a snapshot-log table (operators/maintenance.py) — atomic,
  crash-safe, time-travelable ("stats as of v3") for free.
- ``read_rollup``: union the partial versions (manifest-listed paths,
  |keys|×|batches| rows — never the corpus), merge in PARTIAL
  encoding (sums add, mins min, registers max per bucket), and
  finalize (avg = Σsum/Σcount, HLL estimate on merged registers).
- ``compact_rollup``: publish the merged partials as one new version —
  lossless because merge-of-merges is the same algebra, so compaction
  commutes with any future refresh; read cost returns to |keys| rows.
- ``streaming_rollup_sink``: foreachBatch callback composing the
  partial with the batch-id-idempotent snapshot commit — a checkpointed
  stream maintains the view exactly-once end-to-end.

Scale: every aggregate here is ALGEBRAIC (mergeable) by construction —
that is the admission rule. Non-mergeable stats (exact median) belong
to the quantile operators (operators/quantiles.py), which re-bucket
rather than merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import sha_hash32
from ..functions.numeric import _DEC
from .maintenance import _manifest_lock, read_manifest, write_snapshot

_COMPACT_NOTE = "rollup compaction upto="


def _active_versions(
    store: str, as_of: int | None = None
) -> tuple[dict, list[int]]:
    """The partial versions a reader must merge: everything AFTER the
    latest compaction's folded range, plus the compaction itself.

    A compaction's note records ``upto=K`` — the highest version it
    folded (its own version C is > K because versions are monotonic).
    Reader set = {C*} ∪ {v > K*} for the LATEST compaction C*; a
    refresh publishing concurrently with a compaction lands at v > K*
    and therefore stays active — a racing compaction can hide only
    versions it actually folded. Earlier compactions sit ≤ K* (each
    folded the whole active set at its read time) and drop out.

    ``as_of`` restricts the manifest to versions ≤ that number BEFORE
    applying the rule — time travel: the view's answer exactly as a
    reader at that version would have computed it (compactions after
    the pin are invisible; compactions at or before it supersede their
    folded range just as they did live)."""
    man = read_manifest(store)
    versions = {
        int(k): v
        for k, v in man["versions"].items()
        if as_of is None or int(k) <= as_of
    }
    compactions = {
        v: int(meta["note"][len(_COMPACT_NOTE):])
        for v, meta in versions.items()
        if meta.get("note", "").startswith(_COMPACT_NOTE)
    }
    if not compactions:
        return versions, sorted(versions)
    cstar = max(compactions)
    kstar = compactions[cstar]
    active = sorted(v for v in versions if v == cstar or v > kstar)
    return versions, active

_HLL_M = 64  # buckets; 6 hash bits, ranks from the remaining 26


def _hll_pair(col: Column, seed: int = 29) -> tuple[Column, Column]:
    """(bucket, rank) of one value — identical integer math to
    agg_hll_portable_registers so the sketch stays cross-engine
    portable (bin()-length leading-zero count, no float ops)."""
    h = sha_hash32(col.cast("string"), seed=seed)
    w = (h / _HLL_M).cast("long")  # truncating: non-negative operands
    rank = F.when(w == 0, F.lit(27)).otherwise(F.lit(27) - F.length(F.bin(w)))
    return (h % _HLL_M).cast("int"), rank.cast("int")


def _regs_map(entries: Column) -> Column:
    """bucket→rank map from collected (bucket, rank) structs; sorted so
    the physical map bytes are deterministic across partitionings."""
    return F.map_from_entries(F.array_sort(entries))


def rollup_partial(
    df: DataFrame, keys: list[str], specs: list[dict]
) -> DataFrame:
    """Partial aggregates of one batch: one row per key group.

    ``specs``: ``{"name": str, "kind": str, "col": str}`` with kind in
    count | sum | min | max | avg | approx_distinct. Output columns are
    ``{name}__{part}`` — partials from different batches (even written
    by different jobs) merge by this column contract.
    """
    aggs: list[Column] = []
    hll_specs = [s for s in specs if s["kind"] == "approx_distinct"]
    for s in specs:
        name, kind, col = s["name"], s["kind"], s.get("col")
        if kind == "count":
            aggs.append(F.count(F.lit(1)).cast("long").alias(f"{name}__count"))
        elif kind in ("sum", "avg"):
            # decimal accumulation (the dsum convention,
            # functions/numeric.py): the partial is EXACT, so the merged
            # view is bit-identical no matter how ingestion sliced the
            # batches — a float-typed partial would drift by an ulp per
            # re-grouping and make refresh order observable
            aggs.append(
                F.sum(F.col(col).cast(_DEC)).alias(f"{name}__sum")
            )
            if kind == "avg":
                aggs.append(F.count(col).cast("long").alias(f"{name}__count"))
        elif kind == "min":
            aggs.append(F.min(col).alias(f"{name}__min"))
        elif kind == "max":
            aggs.append(F.max(col).alias(f"{name}__max"))
        elif kind == "approx_distinct":
            pass  # below: needs a bucket-level pre-aggregate
        else:
            raise ValueError(f"unknown agg kind: {kind}")

    out = df.groupBy(*keys).agg(*aggs) if aggs else None

    for s in hll_specs:
        # bucket-level max rank, folded to ONE map column per key —
        # the register set is the mergeable partial (≤ m entries/key)
        bucket, rank = _hll_pair(F.col(s["col"]))
        regs = (
            # nulls don't count as distinct values (count_distinct
            # semantics) — and a null bucket key would poison the map
            df.filter(F.col(s["col"]).isNotNull())
            .select(*keys, bucket.alias("__b"), rank.alias("__r"))
            .groupBy(*keys, "__b")
            .agg(F.max("__r").alias("__r"))
            .groupBy(*keys)
            .agg(_regs_map(F.collect_list(F.struct("__b", "__r"))).alias(
                f"{s['name']}__regs"
            ))
        )
        out = regs if out is None else out.join(regs, keys, "full")
    return out


def merge_partials(
    parts: DataFrame, keys: list[str], specs: list[dict]
) -> DataFrame:
    """Merge any number of partial rows per key back into ONE partial
    row per key — same column contract in and out, so the result can be
    re-published (compaction) or finalized (read). Runs on rollup rows
    only: |keys|×|batches| in, |keys| out."""
    aggs: list[Column] = []
    hll_specs = [s for s in specs if s["kind"] == "approx_distinct"]
    for s in specs:
        name, kind = s["name"], s["kind"]
        if kind in ("count", "avg"):
            aggs.append(
                F.sum(f"{name}__count").cast("long").alias(f"{name}__count")
            )
        if kind in ("sum", "avg"):
            aggs.append(F.sum(f"{name}__sum").alias(f"{name}__sum"))
        if kind == "min":
            aggs.append(F.min(f"{name}__min").alias(f"{name}__min"))
        if kind == "max":
            aggs.append(F.max(f"{name}__max").alias(f"{name}__max"))
    merged = parts.groupBy(*keys).agg(*aggs) if aggs else None

    for s in hll_specs:
        name = s["name"]
        regs = (
            parts.select(*keys, F.explode(f"{name}__regs").alias("__b", "__r"))
            .groupBy(*keys, "__b")
            .agg(F.max("__r").alias("__r"))
            .groupBy(*keys)
            .agg(_regs_map(F.collect_list(F.struct("__b", "__r"))).alias(
                f"{name}__regs"
            ))
        )
        merged = regs if merged is None else merged.join(regs, keys, "full")
    return merged


def _finalize(merged: DataFrame, keys: list[str], specs: list[dict]) -> DataFrame:
    finals: list[Column] = [F.col(k) for k in keys]
    for s in specs:
        name, kind = s["name"], s["kind"]
        if kind == "count":
            finals.append(F.col(f"{name}__count").alias(name))
        elif kind == "sum":
            # exact decimal partial → double only here, at the edge
            finals.append(F.col(f"{name}__sum").cast("double").alias(name))
        elif kind == "min":
            finals.append(F.col(f"{name}__min").alias(name))
        elif kind == "max":
            finals.append(F.col(f"{name}__max").alias(name))
        elif kind == "avg":
            # davg semantics (functions/numeric.py): exact decimal sum
            # cast to double, divided by the long count in double
            finals.append(
                (
                    F.col(f"{name}__sum").cast("double")
                    / F.col(f"{name}__count")
                ).alias(name)
            )
        elif kind == "approx_distinct":
            # estimate on the merged registers, with the linear-counting
            # small-range switch (same constants as the oracle-checked
            # agg_hll_portable_registers)
            # a group whose column was ALL null has no register row
            # (filtered above) and reaches here as a null map through
            # the full join — its distinct count is 0, not null
            regs = F.coalesce(
                F.col(f"{name}__regs"),
                F.map_from_entries(F.array().cast("array<struct<b:int,r:int>>")),
            )
            nb = F.size(regs)
            ssum = (
                F.aggregate(
                    F.map_values(regs),
                    F.lit(0.0),
                    lambda acc, r: acc + F.pow(F.lit(2.0), -r),
                )
                + (F.lit(_HLL_M) - nb)
            )
            raw = 0.709 * _HLL_M * _HLL_M / ssum
            zeros = F.lit(_HLL_M) - nb
            est = F.when(
                (raw <= 2.5 * _HLL_M) & (zeros > 0),
                F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / zeros),
            ).otherwise(raw)
            finals.append(F.round(est, 6).alias(name))
    return merged.select(*finals)


def refresh_rollup(
    df: DataFrame,
    store: str,
    keys: list[str],
    specs: list[dict],
    batch_id: int | None = None,
) -> int:
    """Fold one batch into the view: compute its partials and publish
    them as the next snapshot version. Scans the BATCH only — existing
    partials are never read, so refresh cost is independent of table
    history."""
    return write_snapshot(
        rollup_partial(df, keys, specs),
        store,
        note="rollup partial",
        batch_id=batch_id,
    )


def _active_parts(
    spark: SparkSession, store: str, as_of: int | None = None
) -> tuple[DataFrame, int]:
    versions, active = _active_versions(store, as_of)
    if not active:
        raise ValueError(f"no rollup partials published at {store}")
    paths = [versions[v]["path"] for v in active]
    return spark.read.parquet(*paths), max(active)


def read_rollup(
    spark: SparkSession,
    store: str,
    keys: list[str],
    specs: list[dict],
    as_of: int | None = None,
) -> DataFrame:
    """The view's answer: merge the ACTIVE partials (post-compaction
    versions plus the latest compaction) and finalize. ``as_of`` pins a
    manifest version — "corpus stats as of v3" for reproducible
    training-run reporting, free because published versions are
    immutable. Lock-free: the active set comes from one manifest read."""
    parts, _ = _active_parts(spark, store, as_of)
    return _finalize(merge_partials(parts, keys, specs), keys, specs)


def compact_rollup(
    spark: SparkSession, store: str, keys: list[str], specs: list[dict]
) -> int:
    """Publish the merged ACTIVE partials as one new version whose note
    records the folded range — prior versions drop out of the active
    set instead of double-counting. Lossless: the partial encoding
    survives the merge (registers stay registers), so compaction
    commutes with any future refresh; read cost returns to |keys| rows
    until batches accumulate again.

    Serialized behind its own flock: two UNserialized compactions
    reading the same active set would both publish it and both stay
    active (each's upto excludes the other) — every group then counts
    twice. Refreshes need no such lock: they never fold other
    versions, and the active-set rule keeps any concurrent refresh
    visible."""
    with _manifest_lock(store, lock_name=".rollup.compact.lock"):
        parts, upto = _active_parts(spark, store)
        return write_snapshot(
            merge_partials(parts, keys, specs),
            store,
            note=f"{_COMPACT_NOTE}{upto}",
        )


def streaming_rollup_sink(store: str, keys: list[str], specs: list[dict]):
    """foreachBatch callback: maintain the view from a checkpointed
    stream, exactly-once. At-least-once redelivery (same batch id) is
    absorbed by the snapshot log's batch-id-idempotent commit — a
    replayed batch's partial is skipped, so no group is double-counted;
    the same end-to-end guarantee as streaming_snapshot_sink, composed
    with the partial-aggregate step."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        committed = {
            v.get("batch_id")
            for v in read_manifest(store)["versions"].values()
        }
        if int(batch_id) in committed:
            return
        refresh_rollup(batch_df, store, keys, specs, batch_id=batch_id)

    return commit
