"""Snapshot/manifest checkpoint-resume layer (north_rule).

No Iceberg jars are available in this environment, so the engine
implements the same *semantics* over partitioned parquet + a JSON
manifest commit log:

- data laid out as ``data/bucket=N/*.parquet`` where bucket =
  pmod(xxhash64(key), n_buckets) — deterministic per row key, so a
  re-run produces identical partitioning (required for idempotence;
  never monotonically_increasing_id, see SURVEY.md §1.4).
- append-style writers (streaming micro-batches) pass ``namespace``:
  data lands under ``data/ns=<namespace>/bucket=N`` and manifest keys
  become ``<namespace>/N``, so batches never overwrite each other and
  a replayed batch (same namespace) is idempotent — dynamic partition
  overwrite only touches that batch's own partitions.
- a snapshot = JSON manifest listing committed buckets with per-bucket
  row counts + lineage (parent snapshot id, job id). Manifests are
  written temp-then-rename; ``CURRENT`` is updated last → atomic commit.
- writes use Spark dynamic partition overwrite, so a crash mid-group
  leaves partially-written bucket dirs that the retry simply overwrites.
- resume = read CURRENT → committed bucket set → process only pending
  buckets → commit a child snapshot.

Reference contrast: the reference has no checkpointing at all — a crash
restarts the whole CSV (SURVEY.md §4 'checkpoint/resume' row).

Swap-in path for real Iceberg: replace SnapshotTable with a catalog
table and ``df.writeTo(tbl).overwritePartitions()``; the job logic
(bucket groups, resume filter) is unchanged.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_expr(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


class SnapshotTable:
    """A directory-backed table with an atomic snapshot commit log."""

    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "_manifests")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # ------------------------------------------------------------- manifest
    def current(self) -> dict | None:
        cur = os.path.join(self.manifest_dir, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            name = f.read().strip()
        with open(os.path.join(self.manifest_dir, name)) as f:
            return json.load(f)

    def committed_buckets(self) -> dict[str, int]:
        """bucket key -> row count across the whole committed lineage.

        Keys are ``"N"`` for plain writes or ``"<namespace>/N"`` for
        namespaced (append-mode) writes."""
        snap = self.current()
        return {str(k): int(v) for k, v in (snap or {}).get("buckets", {}).items()}

    def commit(
        self,
        new_buckets: dict[int | str, int],
        job_id: str,
        extra: dict | None = None,
        schema_json: str | None = None,
        new_stats: dict | None = None,
    ) -> dict:
        parent = self.current()
        snap_id = (parent["snapshot_id"] + 1) if parent else 0
        buckets = dict((parent or {}).get("buckets", {}))
        buckets.update({str(b): int(n) for b, n in new_buckets.items()})
        # per-bucket min/max column stats (data skipping): a REWRITTEN
        # bucket's old stats are stale, so every committed bucket drops
        # its entry unless this commit supplies fresh ones — skipping
        # stays conservative (no stats ⇒ never skipped) by construction
        stats = dict((parent or {}).get("column_stats", {}))
        for b in new_buckets:
            stats.pop(str(b), None)
        for b, s in (new_stats or {}).items():
            stats[str(b)] = s
        snap = {
            "snapshot_id": snap_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "job_id": job_id,
            "committed_at": time.time(),
            "buckets": buckets,
            "total_rows": int(sum(buckets.values())),
            "column_stats": stats,
            "metrics": extra or {},
            # row schema (JSON) so sparse/empty tables stay readable
            "schema": schema_json or (parent or {}).get("schema"),
        }
        return self._write_manifest(snap)

    def _write_manifest(self, snap: dict) -> dict:
        name = f"snapshot-{snap['snapshot_id']:06d}.json"
        tmp = os.path.join(self.manifest_dir, f".{name}.tmp")
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1)
        os.replace(tmp, os.path.join(self.manifest_dir, name))
        cur_tmp = os.path.join(self.manifest_dir, ".CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(name)
        os.replace(cur_tmp, os.path.join(self.manifest_dir, "CURRENT"))
        return snap

    def commit_replace(
        self,
        new_buckets: dict[str, int],
        job_id: str,
        extra: dict | None = None,
        schema_json: str | None = None,
    ) -> dict:
        """Commit a snapshot whose bucket set REPLACES the lineage view
        (compaction): the new snapshot references only ``new_buckets``;
        older data dirs stay on disk so time travel to pre-compaction
        snapshots keeps working until ``vacuum``."""
        parent = self.current()
        snap_id = (parent["snapshot_id"] + 1) if parent else 0
        buckets = {str(b): int(n) for b, n in new_buckets.items()}
        snap = {
            "snapshot_id": snap_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "job_id": job_id,
            "committed_at": time.time(),
            "buckets": buckets,
            "total_rows": int(sum(buckets.values())),
            "metrics": {**(extra or {}), "replace": True},
            "schema": schema_json or (parent or {}).get("schema"),
        }
        return self._write_manifest(snap)

    def vacuum(self, keep_snapshots: int = 1) -> dict:
        """Expire all but the last ``keep_snapshots`` manifests and
        delete data directories no kept snapshot references — the
        expire_snapshots + remove_orphan_files maintenance pair. Returns
        {'removed_dirs': [...], 'removed_manifests': [...]}."""
        import shutil

        hist = self.history()
        if not hist:
            return {"removed_dirs": [], "removed_manifests": []}
        kept, expired = hist[-keep_snapshots:], hist[:-keep_snapshots]
        referenced = {
            os.path.relpath(self._bucket_path(str(k)), self.data_dir)
            for snap in kept
            for k in snap.get("buckets", {})
        }
        # every bucket dir on disk: bucket=N and ns=X/bucket=N
        on_disk = []
        for entry in sorted(os.listdir(self.data_dir)):
            p = os.path.join(self.data_dir, entry)
            if not os.path.isdir(p):
                continue
            if entry.startswith("bucket="):
                on_disk.append(entry)
            elif entry.startswith("ns="):
                on_disk.extend(
                    f"{entry}/{sub}"
                    for sub in sorted(os.listdir(p))
                    if sub.startswith("bucket=")
                )
        removed_dirs = []
        for rel in on_disk:
            if rel not in referenced:
                shutil.rmtree(os.path.join(self.data_dir, rel))
                removed_dirs.append(rel)
        # prune now-empty ns= parents
        for entry in sorted(os.listdir(self.data_dir)):
            p = os.path.join(self.data_dir, entry)
            if entry.startswith("ns=") and os.path.isdir(p) and not os.listdir(p):
                os.rmdir(p)
        removed_manifests = []
        for snap in expired:
            name = f"snapshot-{snap['snapshot_id']:06d}.json"
            path = os.path.join(self.manifest_dir, name)
            if os.path.exists(path):
                os.remove(path)
                removed_manifests.append(name)
        return {"removed_dirs": removed_dirs, "removed_manifests": removed_manifests}

    def history(self) -> list[dict]:
        names = sorted(
            n for n in os.listdir(self.manifest_dir) if n.startswith("snapshot-")
        )
        out = []
        for n in names:
            with open(os.path.join(self.manifest_dir, n)) as f:
                out.append(json.load(f))
        return out

    # ----------------------------------------------------------------- read
    def _bucket_path(self, key: str) -> str:
        if "/" in key:
            ns, b = key.split("/", 1)
            return os.path.join(self.data_dir, f"ns={ns}", f"bucket={b}")
        return os.path.join(self.data_dir, f"bucket={key}")

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        merge_schema: bool = False,
        prune: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Committed rows only (uncommitted bucket dirs are invisible).

        ``prune`` enables manifest-stats data skipping (the Iceberg
        min/max file-skipping analog at bucket granularity): for each
        ``{col: (lo, hi)}`` entry, buckets whose committed [min, max]
        range (written via ``write_snapshotted(stats_cols=...)``) is
        DISJOINT from [lo, hi] are not scanned at all. Skipping is an
        optimization, not a filter — returned rows still need the real
        predicate applied; buckets without stats are always kept.

        ``merge_schema=True`` unions the schemas across committed file
        sets (parquet mergeSchema) — the additive-column evolution path:
        appenders may add columns over time; older rows read as null.

        Zero-count buckets are committed in the manifest but produce no
        directory under dynamic partition overwrite, so they are skipped
        when assembling the path list (sparse/skewed inputs would
        otherwise raise PATH_NOT_FOUND). An all-empty committed table
        reads back as an empty DataFrame via the manifest schema.

        ``snapshot_id`` time-travels: buckets visible as of that commit.
        NOTE: bucket dirs are overwritten in place, so time travel is
        exact for append-style jobs (each bucket committed once per
        lineage) — the common resume case; a full Iceberg catalog would
        version data files too.
        """
        snap = self.current() if snapshot_id is None else self.snapshot(snapshot_id)
        if snap is None:
            raise ValueError(f"no committed snapshot in {self.root}")
        buckets = {str(k): int(v) for k, v in snap.get("buckets", {}).items()}
        if not buckets:
            raise ValueError(f"no committed snapshot in {self.root}")
        paths = [
            self._bucket_path(k)
            for k in self.live_bucket_keys(snap, prune=prune)
        ]
        if not paths:
            schema_json = snap.get("schema")
            if schema_json is None:
                raise ValueError(
                    f"committed table in {self.root} is empty and carries no schema"
                )
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(schema_json))
            # a truly empty frame — scanning data_dir here would surface
            # uncommitted bucket dirs left by a crashed writer, violating
            # the committed-rows-only invariant exactly when it matters
            return spark.createDataFrame([], schema)
        reader = spark.read.option("basePath", self.data_dir)
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    def live_bucket_keys(
        self, snap: dict, prune: dict[str, tuple] | None = None
    ) -> list[str]:
        """Bucket keys a read must scan: committed, non-empty, and —
        with ``prune`` — not provably disjoint from the predicate
        ranges per the manifest min/max stats (exposed separately so
        tests can assert exactly WHICH buckets skipping eliminates)."""
        stats = snap.get("column_stats", {})
        keys = []
        for k, n in sorted(snap.get("buckets", {}).items()):
            if int(n) <= 0:
                continue
            st = stats.get(str(k))
            if prune and st:
                skip = False
                for col, (lo, hi) in prune.items():
                    rng = st.get(col)
                    try:
                        if (
                            rng is not None
                            and rng[0] is not None
                            and rng[1] is not None
                            and (rng[1] < lo or rng[0] > hi)
                        ):
                            skip = True
                            break
                    except TypeError:
                        # committed stats and caller bounds of
                        # incomparable types (e.g. string stats vs
                        # numeric bounds): fall back to the documented
                        # "no stats => never skipped" conservatism
                        # instead of crashing the read (ADVICE r6)
                        continue
                if skip:
                    continue
            keys.append(str(k))
        return keys

    def snapshot(self, snapshot_id: int) -> dict:
        path = os.path.join(self.manifest_dir, f"snapshot-{snapshot_id:06d}.json")
        with open(path) as f:
            return json.load(f)


def upsert_snapshotted(
    df: DataFrame,
    table: SnapshotTable,
    key_col: str = "image_id",
    n_buckets: int = 32,
    job_id: str | None = None,
    tombstone_col: str | None = None,
) -> dict:
    """Keyed upsert (MERGE INTO analog) with BUCKET PRUNING: only the
    buckets that contain an incoming key are read, merged (incoming row
    wins on key conflict), and rewritten — at 10^12 rows an upsert of a
    few thousand keys touches a handful of bucket directories, never
    the table. Plain-layout tables only (append-namespace tables are
    delta logs; run ``compact_table(..., layout='plain')`` first — the
    namespace→plain rewrite that makes a table upsertable).
    ``n_buckets`` must match the value the table was written with — it
    is validated against the manifest.

    ``tombstone_col`` enables MERGE-style DELETE: incoming rows whose
    (boolean) tombstone is true remove that key from the table instead
    of inserting; the column itself never lands in storage. Deleting a
    key that does not exist is a no-op — the full WHEN MATCHED THEN
    DELETE contract, still bucket-pruned."""
    spark = df.sparkSession
    job_id = job_id or f"upsert-{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    cur = table.current()
    if cur is not None:
        committed = table.committed_buckets()
        if any("/" in k for k in committed):
            raise ValueError(
                "upsert requires a plain-layout table "
                "(run compact_table(layout='plain') first)"
            )
        manifest_n = cur.get("metrics", {}).get("n_buckets")
        if manifest_n is not None and int(manifest_n) != n_buckets:
            raise ValueError(
                f"table was written with n_buckets={manifest_n}, got {n_buckets}"
            )

    touched_keys = df.select(key_col).distinct()
    if tombstone_col is not None:
        flag = F.coalesce(F.col(tombstone_col).cast("boolean"), F.lit(False))
        df = df.filter(~flag).drop(tombstone_col)
    incoming = df.withColumn("bucket", bucket_expr(key_col, n_buckets))
    affected = sorted(
        int(r["bucket"])
        for r in touched_keys.select(bucket_expr(key_col, n_buckets).alias("bucket"))
        .distinct()
        .collect()
    )
    if cur is None:
        merged = incoming
    else:
        old = table.read(spark).filter(F.col("bucket").isin(affected))
        keep = old.join(touched_keys, key_col, "left_anti")
        merged = keep.select(*incoming.columns).unionByName(incoming)
    # materialize BEFORE overwriting: the merge plan reads the very
    # bucket directories the write replaces (classic self-overwrite
    # hazard), and the post-write count must not re-scan deleted files.
    # The checkpoint holds only the affected buckets — small by design.
    merged = merged.localCheckpoint()
    merged.write.mode("overwrite").partitionBy("bucket").parquet(table.data_dir)
    counts = {
        str(int(r["bucket"])): int(r["count"])
        for r in merged.groupBy("bucket").count().collect()
    }
    for b in affected:
        counts.setdefault(str(b), 0)
    return table.commit(
        counts,
        job_id,
        extra={"upsert_buckets": affected, "n_buckets": n_buckets},
        schema_json=incoming.schema.json(),
    )


def compact_table(
    spark: SparkSession,
    table: SnapshotTable,
    key_col: str,
    n_buckets: int = 32,
    job_id: str | None = None,
    layout: str = "namespace",
) -> dict:
    """Small-file compaction (Iceberg rewrite_data_files analog):
    streaming appends leave one file set per (batch, bucket); this job
    reads every committed row, rewrites it compacted, and commits a
    REPLACING snapshot. Readers flip atomically to the compacted
    layout; pre-compaction snapshots stay time-travelable until
    ``table.vacuum()`` reclaims their directories.

    ``layout='namespace'`` (default) writes under one fresh
    ``ns=compact-N`` namespace — append-log style. ``layout='plain'``
    rewrites to the plain ``bucket=N`` layout, which is the bridge from
    an append-namespaced delta log to an UPSERTABLE table
    (``upsert_snapshotted`` requires plain layout); the rows are
    materialized (localCheckpoint) before the overwrite because the
    target bucket dirs may be the very dirs being read."""
    cur = table.current()
    if cur is None:
        raise ValueError(f"nothing to compact in {table.root}")
    if layout not in ("namespace", "plain"):
        raise ValueError(f"unknown layout {layout!r}")
    df = table.read(spark).drop("ns", "bucket")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucketed = df.withColumn("bucket", bucket_expr(key_col, n_buckets))
    if layout == "namespace":
        ns = f"compact-{cur['snapshot_id'] + 1}"
        bucketed = bucketed.withColumn("ns", F.lit(ns))
        bucketed.write.mode("overwrite").partitionBy("ns", "bucket").parquet(
            table.data_dir
        )
        key_of = lambda b: f"{ns}/{b}"  # noqa: E731
    else:
        bucketed = bucketed.localCheckpoint()
        bucketed.write.mode("overwrite").partitionBy("bucket").parquet(table.data_dir)
        key_of = str
    counts = {
        key_of(int(r["bucket"])): int(r["count"])
        for r in bucketed.groupBy("bucket").count().collect()
    }
    for b in range(n_buckets):
        counts.setdefault(key_of(b), 0)
    return table.commit_replace(
        counts,
        job_id or f"compact-{cur['snapshot_id'] + 1}",
        extra={"compacted_from": cur["snapshot_id"], "n_buckets": n_buckets},
        schema_json=bucketed.schema.json(),
    )


def write_snapshotted(
    df: DataFrame,
    table: SnapshotTable,
    key_col: str = "image_id",
    n_buckets: int = 32,
    group_size: int = 8,
    job_id: str | None = None,
    fail_after_groups: int | None = None,
    namespace: str | None = None,
    metrics: dict | None = None,
    stats_cols: list[str] | None = None,
) -> dict:
    """Write ``df`` into ``table`` in bucket groups, committing a snapshot
    (with per-bucket row counts + lineage) after each group.

    ``namespace`` enables append mode: data lands under
    ``data/ns=<namespace>/bucket=N`` so successive writers (e.g.
    streaming micro-batches, one namespace per batch) accumulate instead
    of overwriting each other, while a REPLAY of the same namespace is
    still idempotent (its committed buckets are skipped, its dirs are
    the only ones dynamic-partition-overwrite touches). A table should
    be written either always-plain or always-namespaced.

    ``fail_after_groups`` injects a crash after N commits (tests).
    Resume = call again with the same args: committed buckets are
    skipped, pending ones recomputed and committed as child snapshots.

    ``stats_cols`` records per-bucket min/max for the named columns in
    the manifest (numeric or string, JSON-representable) — the data
    the read side's ``prune`` uses for bucket skipping. The stats ride
    the SAME per-group aggregate that already computes bucket counts,
    so enabling them adds no extra job.
    """
    spark = df.sparkSession
    job_id = job_id or uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    bucketed = df.withColumn("bucket", bucket_expr(key_col, n_buckets))
    part_cols = ["bucket"]
    if namespace is not None:
        if "/" in namespace or "=" in namespace:
            raise ValueError(f"invalid namespace {namespace!r} (no '/' or '=')")
        bucketed = bucketed.withColumn("ns", F.lit(namespace))
        part_cols = ["ns", "bucket"]

    def key_of(b: int) -> str:
        return str(b) if namespace is None else f"{namespace}/{b}"

    done = set(table.committed_buckets())
    pending = [b for b in range(n_buckets) if key_of(b) not in done]
    groups = [pending[i : i + group_size] for i in range(0, len(pending), group_size)]
    schema_json = bucketed.schema.json()

    # materialize the (pending rows of the) derivation ONCE: each group
    # commit below filters + writes + counts, and without a checkpoint
    # every one of those re-runs the full upstream DAG (n_buckets /
    # group_size rescans). The per-group commit stays the crash-resume
    # granularity; only the recomputation is gone.
    source = bucketed
    if len(groups) > 1:
        source = bucketed.filter(
            F.col("bucket").isin([int(b) for b in pending])
        ).localCheckpoint()

    last = table.current() or {}
    for gi, group in enumerate(groups):
        part = source.filter(F.col("bucket").isin([int(b) for b in group]))
        part.write.mode("overwrite").partitionBy(*part_cols).parquet(table.data_dir)
        aggs = [F.count(F.lit(1)).alias("count")]
        for c in stats_cols or []:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        rows = part.groupBy("bucket").agg(*aggs).collect()
        counts = {key_of(int(r["bucket"])): int(r["count"]) for r in rows}
        stats = (
            {
                key_of(int(r["bucket"])): {
                    c: [r[f"__mn_{c}"], r[f"__mx_{c}"]] for c in stats_cols
                }
                for r in rows
            }
            if stats_cols
            else None
        )
        for b in group:  # empty buckets still count as committed
            counts.setdefault(key_of(int(b)), 0)
        last = table.commit(
            counts,
            job_id,
            extra={
                "group_index": gi,
                "group": list(group),
                "namespace": namespace,
                "n_buckets": n_buckets,
                **(metrics or {}),
            },
            schema_json=schema_json,
            new_stats=stats,
        )
        if fail_after_groups is not None and gi + 1 >= fail_after_groups:
            raise RuntimeError(f"injected failure after {gi + 1} group commits")
    return last
