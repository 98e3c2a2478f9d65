"""Exactly-once sink via idempotent per-batch commits.

Structured Streaming's ``foreachBatch`` gives at-least-once batch
delivery with a stable ``batch_id`` per checkpoint; exactly-once is
completed by making the write idempotent on ``batch_id`` (the same
protocol Iceberg implements natively with its
``spark.sql.streaming.commit`` snapshot property — see
IdempotentSink.docstring).

This module ships three implementations behind one interface:

- ``IdempotentParquetSink``: rename-marker protocol — fastest, but
  sound only where rename is atomic (local/NFS, hdfs://, viewfs://);
  every other scheme is rejected.
    data    →  <root>/data/batch=<id>/...      (overwrite on replay)
    commit  →  <root>/_commits/<id>            (atomic rename marker)
- ``ManifestCommitSink``: rename-FREE protocol for object stores —
  unique attempt directories + versioned manifest objects published by
  atomic PUT, readers follow the winning manifest's exact file list.
  The executable answer where rename is copy+delete (s3a, gs, abfs).
- ``IcebergSink``: appends with a WAP-style idempotency check — used
  when an Iceberg catalog is configured (not available in this sandbox;
  the class raises cleanly if the runtime lacks Iceberg).
  ManifestCommitSink implements the same commit idea without the
  runtime dependency.

Lineage: ``add_lineage`` stamps each row with the batch id, task
partition id, and (for file sources) the input file — the per-partition
lineage required by the north rule.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil as _fsutil


def add_lineage(df: DataFrame, batch_id: Optional[int] = None) -> DataFrame:
    """Stamp per-partition lineage columns onto a batch DataFrame."""
    out = (
        df.withColumn("_lineage_partition", F.spark_partition_id())
        .withColumn("_lineage_file", F.input_file_name())
        .withColumn("_lineage_commit_ts", F.current_timestamp())
    )
    if batch_id is not None:
        out = out.withColumn("_lineage_batch", F.lit(int(batch_id)))
    return out


# URI schemes with ATOMIC rename — the only ones the commit-marker
# protocol is sound on.  An allowlist, not a blocklist: any unknown
# scheme (s3a, gs, swift, custom FUSE, …) is rejected so the contract
# cannot rot as new stores appear; ManifestCommitSink (rename-free) is
# the answer on object stores.
_ATOMIC_RENAME_SCHEMES = ("", "file", "hdfs", "viewfs")


class IdempotentParquetSink:
    """Exactly-once parquet sink keyed by foreachBatch batch_id.

    Marker I/O goes through the Hadoop FileSystem API, so the protocol
    holds anywhere rename is atomic: local/NFS paths AND hdfs:// /
    viewfs:// — the cluster story no longer depends on driver-local
    POSIX.  Every other scheme is rejected (object-store rename is
    copy+delete, which breaks marker atomicity) — use IcebergSink
    there."""

    def __init__(self, root: str, lineage: bool = True) -> None:
        scheme = root.split("://", 1)[0].lower() if "://" in root else ""
        if scheme not in _ATOMIC_RENAME_SCHEMES:
            raise ValueError(
                f"IdempotentParquetSink needs atomic rename; {scheme}:// "
                "is not known to provide it — use ManifestCommitSink "
                "(rename-free) or IcebergSink for object stores"
            )
        self.root = root
        self.lineage = lineage

    # -- Hadoop FS helpers live in jepl_spark.fsutil (shared with the
    # ANN index metadata sidecars) -----------------------------------------

    @staticmethod
    def _active_spark() -> SparkSession:
        s = SparkSession.getActiveSession()
        if s is None:  # pragma: no cover - foreachBatch always has one
            raise RuntimeError("no active SparkSession for sink marker I/O")
        return s

    @property
    def _commits_dir(self) -> str:
        return os.path.join(self.root, "_commits")

    def _commit_marker(self, batch_id: int) -> str:
        return os.path.join(self._commits_dir, str(int(batch_id)))

    def is_committed(self, batch_id: int, spark: Optional[SparkSession] = None) -> bool:
        spark = spark or self._active_spark()
        fs, jpath, _ = _fsutil.hadoop_fs(spark, self._commit_marker(batch_id))
        return fs.exists(jpath)

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback.  Replays of an already-committed
        batch are no-ops; replays of an uncommitted batch overwrite
        their own directory before the marker lands — idempotent."""
        spark = batch_df.sparkSession
        if self.is_committed(batch_id, spark):
            return
        out = add_lineage(batch_df, batch_id) if self.lineage else batch_df
        path = os.path.join(self.root, "data", f"batch={int(batch_id)}")
        out.write.mode("overwrite").parquet(path)
        # atomic commit marker: write a temp file, then FS rename
        # (atomic on POSIX and HDFS; object stores are rejected above).
        # fsutil.rename raises on Hadoop's false-return failure mode —
        # swallowing it would let the checkpoint advance past a batch
        # no reader will ever see (silent data loss).
        payload = json.dumps({"batch_id": int(batch_id), "ts": time.time()})
        tmp = os.path.join(
            self._commits_dir, f"_tmp_{int(batch_id)}_{os.getpid()}"
        )
        _fsutil.write_text(spark, tmp, payload)
        _fsutil.rename(spark, tmp, self._commit_marker(batch_id))

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        return self.write_batch

    def committed_batches(self, spark: Optional[SparkSession] = None) -> list[int]:
        spark = spark or self._active_spark()
        fs, jpath, _ = _fsutil.hadoop_fs(spark, self._commits_dir)
        if not fs.exists(jpath):
            return []
        # ignore orphaned temp files left by a crash between marker
        # creation and the atomic rename — that crash window is exactly
        # what this protocol exists to survive
        names = [st.getPath().getName() for st in fs.listStatus(jpath)]
        return sorted(int(x) for x in names if x.isdigit())

    def committed_count(self, spark: Optional[SparkSession] = None) -> int:
        """Total committed batches (same accessor as ManifestCommitSink,
        so callers can report counts sink-agnostically)."""
        return len(self.committed_batches(spark))

    def read_committed(self, spark: SparkSession) -> DataFrame:
        """Read exactly the committed batches (uncommitted partials,
        which can exist transiently after a crash, are invisible)."""
        batches = self.committed_batches(spark)
        if not batches:
            raise ValueError(f"no committed batches under {self.root}")
        paths = [
            os.path.join(self.root, "data", f"batch={b}") for b in batches
        ]
        return spark.read.option("basePath", os.path.join(self.root, "data")).parquet(
            *paths
        )


class ManifestCommitSink:
    """Exactly-once sink with NO atomic-rename dependency — the
    executable object-store answer next to ``IdempotentParquetSink``
    (rename-atomic filesystems) and ``IcebergSink`` (design-only here:
    no Iceberg runtime in this sandbox).

    Protocol (the manifest-commit variant of Iceberg's snapshot commit,
    specialized to foreachBatch's single-writer-per-query contract):

    - data files for batch B are written to a UNIQUE attempt directory
      ``data/batch=B/attempt=<uuid>/`` — never overwritten in place, so
      a crashed attempt can only leave ORPHANS, never torn visible data;
    - after the write job succeeds, the attempt's part files are listed
      and a NEW manifest object ``_manifests/v<N+1>-<uuid>.json`` is
      PUT, carrying the full batches→files map (previous manifest's map
      + this batch).  Readers list the manifest directory, pick the
      highest (version, name) — a deterministic last-writer-wins — and
      read EXACTLY the files it names;
    - a replayed batch whose id is already in the current manifest is a
      no-op; a replay of an uncommitted batch writes a fresh attempt and
      publishes the next manifest version.

    The only store primitives required are atomic PUT of a whole new
    object and LIST — both hold on S3 (strongly consistent since 2020),
    GCS, ABFS, HDFS, and POSIX.  Rename never happens, so rename
    non-atomicity cannot lose or duplicate data.  Crash windows:
    * after data write, before manifest PUT → orphan files, invisible
      (not in any manifest); the replay commits a fresh attempt once.
    * after manifest PUT → replay sees the batch committed → no-op.

    Single-writer assumption: one streaming query owns one sink root
    (Structured Streaming's foreachBatch contract).  If two zombie
    writers ever race the same version number, last-writer-wins picks
    one attempt's files deterministically — each candidate manifest is
    a consistent exactly-once view, matching Iceberg's semantics when
    its CAS is reduced to LWW.

    Object-store fault matrix (what each failure can and cannot do):

    * LIST-after-PUT consistency — REQUIRED.  Readers discover the
      winner by LIST; S3 (since Dec 2020), GCS, ABFS, HDFS, POSIX all
      guarantee a PUT object appears in a subsequent LIST.  On an
      eventually-consistent store a reader may resolve a SUPERSEDED
      manifest — still a consistent exactly-once view, just stale
      (bounded by the store's convergence window); it can never see a
      torn or partial one, because manifests are whole-object PUTs.
    * N ≥ 2 concurrent writers (zombie matrix) — every manifest
      carries the FULL batches→files map, so manifests form
      self-contained candidate snapshots, not deltas: however many
      writers interleave or fork version numbers, max(version, name)
      elects exactly one winner per manifest set, every reader agrees,
      and no reader ever mixes files from two attempts.  What CAN
      happen is a lost update: a batch committed only on a losing fork
      is invisible in the winner, and ``is_committed`` then answers
      false — so the restarted (single legitimate) writer re-commits
      it on replay, which converges the chain (tested).  The zombie's
      data files become orphans for ``vacuum``.
    * PUT-during-LIST — a reader racing a writer sees either the old
      or the new winner; both are committed snapshots.
    * Partial data-file upload — data files land in a fresh attempt
      directory and are referenced only by a manifest PUT AFTER the
      write job succeeds; a torn upload is unreferenced garbage.
    * Compaction/vacuum under concurrency — compact() and vacuum()
      require the same single-writer ownership as commits (a writer
      mid-attempt looks like orphans to vacuum); run them from the
      owning query's maintenance slot, never a side job.

    Lineage: rows carry the same ``add_lineage`` stamps as the parquet
    sink, plus the manifest records per-batch file lists — the
    per-partition lineage required by the north rule survives compaction
    decisions because readers never glob."""

    _MANIFESTS = "_manifests"

    def __init__(self, root: str, lineage: bool = True) -> None:
        self.root = root
        self.lineage = lineage

    # -- manifest I/O -----------------------------------------------------

    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, self._MANIFESTS)

    @staticmethod
    def _active_spark() -> SparkSession:
        s = SparkSession.getActiveSession()
        if s is None:  # pragma: no cover - foreachBatch always has one
            raise RuntimeError("no active SparkSession for sink manifest I/O")
        return s

    def _manifest_names(self, spark: SparkSession) -> list[str]:
        fs, jpath, _ = _fsutil.hadoop_fs(spark, self._manifest_dir)
        if not fs.exists(jpath):
            return []
        names = [st.getPath().getName() for st in fs.listStatus(jpath)]
        return [n for n in names if n.startswith("v") and n.endswith(".json")]

    def current_manifest(self, spark: Optional[SparkSession] = None) -> dict:
        """The winning manifest: highest (zero-padded version, name) —
        deterministic for any fixed set of manifest objects.

        Fields: ``version``; ``batches`` (id → exact file list for
        batches newer than any pruning compaction); and the bounded-
        history pair ``compacted_through`` (every batch id ≤ this is
        committed; −1 = none) + ``compacted_files`` (the shared
        rewritten file set those batches live in)."""
        spark = spark or self._active_spark()
        names = self._manifest_names(spark)
        if not names:
            return {"version": 0, "batches": {}, "compacted_through": -1,
                    "compacted_files": [], "n_compacted": 0}
        winner = max(names)  # v%012d- prefix makes lexicographic == numeric
        man = json.loads(
            _fsutil.read_text(spark, os.path.join(self._manifest_dir, winner))
        )
        man.setdefault("compacted_through", -1)
        man.setdefault("compacted_files", [])
        man.setdefault("n_compacted", 0)
        return man

    # -- protocol ----------------------------------------------------------

    def is_committed(self, batch_id: int, spark: Optional[SparkSession] = None) -> bool:
        man = self.current_manifest(spark)
        # the watermark is sound for streaming replay: batch ids from one
        # checkpoint are monotonic, so if id N committed, every id < N did
        return int(batch_id) <= man["compacted_through"] or (
            str(int(batch_id)) in man["batches"]
        )

    def committed_batches(self, spark: Optional[SparkSession] = None) -> list[int]:
        """Explicitly-listed committed batch ids.  After a
        prune_history compaction the pre-watermark ids are summarized
        by ``compacted_through`` (see current_manifest) and no longer
        enumerated here — use ``committed_count`` for the total."""
        return sorted(
            int(b) for b in self.current_manifest(spark)["batches"]
        )

    def committed_count(self, spark: Optional[SparkSession] = None) -> int:
        """TOTAL committed batches, surviving prune_history compactions
        (the ``n_compacted`` counter carries the folded ids' count)."""
        man = self.current_manifest(spark)
        return int(man["n_compacted"]) + len(man["batches"])

    def _list_parquet(self, spark: SparkSession, directory: str) -> list[str]:
        fs, jpath, _ = _fsutil.hadoop_fs(spark, directory)
        return sorted(
            str(st.getPath().toString())
            for st in fs.listStatus(jpath)
            if st.getPath().getName().endswith(".parquet")
        )

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        import uuid

        spark = batch_df.sparkSession
        man = self.current_manifest(spark)
        if (int(batch_id) <= man["compacted_through"]
                or str(int(batch_id)) in man["batches"]):
            return  # replay of a committed batch → no-op
        attempt = uuid.uuid4().hex
        out = add_lineage(batch_df, batch_id) if self.lineage else batch_df
        attempt_dir = os.path.join(
            self.root, "data", f"batch={int(batch_id)}", f"attempt={attempt}"
        )
        # errorifexists: the attempt dir is unique by construction, so an
        # existing one means a protocol violation worth failing loudly on
        out.write.mode("error").parquet(attempt_dir)
        files = self._list_parquet(spark, attempt_dir)
        new_man = {
            "version": int(man["version"]) + 1,
            "batches": {**man["batches"], str(int(batch_id)): files},
            "compacted_through": man["compacted_through"],
            "compacted_files": man["compacted_files"],
            "n_compacted": int(man["n_compacted"]),
            "ts": time.time(),
        }
        name = f"v{new_man['version']:012d}-{attempt}.json"
        # atomic PUT of a whole new object — the commit point
        _fsutil.write_text(
            spark, os.path.join(self._manifest_dir, name), json.dumps(new_man)
        )

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        return self.write_batch

    # -- readers / maintenance ----------------------------------------------

    def read_committed(self, spark: SparkSession) -> DataFrame:
        """Read EXACTLY the files named by the winning manifest —
        orphans from crashed attempts are invisible by construction.
        File lists are de-duplicated: after compact() several batch ids
        share one rewritten file set."""
        man = self.current_manifest(spark)
        if not man["batches"] and man["compacted_through"] < 0:
            raise ValueError(f"no committed batches under {self.root}")
        files = sorted(
            {f for fl in man["batches"].values() for f in fl}
            | set(man["compacted_files"])
        )
        if not files:
            raise ValueError(
                f"committed batches under {self.root} contain no data files "
                "(all batches were empty) — nothing to infer a schema from"
            )
        return spark.read.parquet(*files)

    def compact(self, spark: SparkSession, min_batches: int = 2,
                target_partitions: int = 1,
                prune_history: bool = False) -> bool:
        """Rewrite all committed data files into ``target_partitions``
        files and publish the next manifest version, with every
        non-empty batch id mapped to the shared compacted file set.

        This is the maintenance half the 10¹²-row story needs: an
        availableNow/minutely stream commits one small file set per
        micro-batch, and a year of micro-batches is millions of tiny
        parquet files — the classic small-file collapse of any
        object-store table.  Because readers follow the manifest (never
        a directory glob), compaction is just another atomic manifest
        PUT: concurrent readers see the old or the new version, both
        complete; replay idempotency is untouched since batch IDS stay
        in the map.  Old files become orphans for ``vacuum()``.

        ``prune_history=True`` additionally collapses the per-batch map
        into the ``compacted_through`` watermark (every id ≤ watermark
        is committed) — withOUT it, the manifest's batches→files map
        repeats the shared file list per batch id and still grows with
        every micro-batch ever committed (empty batches included); WITH
        it, manifest size is bounded by the batches committed since the
        last compaction.  This is the analogue of Iceberg's snapshot
        expiry: use it on unbounded streams, skip it if you need the
        exact historical batch-id → file mapping.  Pruning REQUIRES the
        committed ids to be gap-free above the previous watermark
        (Structured Streaming's monotonic batch ids guarantee this) and
        raises otherwise — a gap folded under the watermark would turn
        a future commit of the missing id into a silent no-op.  When
        every foldable batch is empty, pruning publishes a
        metadata-only manifest (no data rewrite) so idle streams stay
        bounded too.

        Same single-writer assumption as write_batch: run from the
        owning maintenance process, not concurrently with an active
        writer racing manifest versions.  Returns False (no-op) when
        fewer than ``min_batches`` foldable entries exist (non-empty
        batches + the existing compacted set; with prune_history, empty
        batches count too — they are map entries worth folding)."""
        import uuid

        man = self.current_manifest(spark)
        ids = sorted(int(b) for b in man["batches"])
        has_compacted = 1 if man["compacted_files"] else 0
        if prune_history:
            # every map entry (empty ones included) is foldable into
            # the watermark; an idle stream's empty-batch entries are
            # exactly the unbounded growth pruning exists to stop
            foldable = len(ids) + has_compacted
        else:
            foldable = (
                len([b for b, fl in man["batches"].items() if fl])
                + has_compacted
            )
        if foldable < min_batches:
            return False
        if prune_history and ids:
            # the watermark claims every id ≤ max is committed — refuse
            # if that would swallow a gap (non-streaming id patterns)
            expect = list(range(man["compacted_through"] + 1, ids[-1] + 1))
            if ids != expect:
                raise ValueError(
                    f"prune_history requires gap-free batch ids above the "
                    f"watermark ({man['compacted_through']}); got {ids} — "
                    f"a gap folded under the watermark would silently "
                    f"no-op a future commit of the missing id"
                )
        files = sorted(
            {f for fl in man["batches"].values() for f in fl}
            | set(man["compacted_files"])
        )
        attempt = uuid.uuid4().hex
        if files:
            outdir = os.path.join(
                self.root, "data", "batch=compacted", f"attempt={attempt}"
            )
            (
                spark.read.parquet(*files)
                .repartition(target_partitions)
                .write.mode("error")
                .parquet(outdir)
            )
            newfiles = self._list_parquet(spark, outdir)
        elif prune_history:
            newfiles = []  # metadata-only fold of empty batches
        else:
            return False  # nothing to rewrite and nothing to fold
        if prune_history:
            watermark = max([man["compacted_through"]] + ids)
            new_man = {
                "version": int(man["version"]) + 1,
                "batches": {},
                "compacted_through": watermark,
                "compacted_files": newfiles,
                "n_compacted": int(man.get("n_compacted", 0)) + len(ids),
                "ts": time.time(),
            }
        else:
            new_man = {
                "version": int(man["version"]) + 1,
                "batches": {
                    b: (newfiles if fl else [])
                    for b, fl in man["batches"].items()
                },
                "compacted_through": man["compacted_through"],
                "compacted_files": newfiles if man["compacted_files"] else [],
                "n_compacted": int(man.get("n_compacted", 0)),
                "ts": time.time(),
            }
        name = f"v{new_man['version']:012d}-{attempt}.json"
        _fsutil.write_text(
            spark, os.path.join(self._manifest_dir, name), json.dumps(new_man)
        )
        return True

    def vacuum(self, spark: SparkSession, keep_manifests: int = 3) -> list[str]:
        """Delete the orphan data files (crashed or superseded attempts)
        AND superseded manifest objects (keeping the newest
        ``keep_manifests``; values < 1 are clamped to 1 — the winning
        manifest is never deleted), returning the deleted paths.
        Without manifest pruning the _manifests/ directory grows one
        object per commit forever, and every current_manifest() LIST
        pays for it.

        Reader-safety: data files referenced by ANY retained manifest
        are protected, not just the winning one — a stale reader that
        resolved one of the ``keep_manifests`` newest manifests still
        sees a consistent snapshot after a vacuum that follows a
        compact() (the superseded manifest's pre-rewrite files survive
        until that manifest itself ages out).  A reader that stalls
        past ``keep_manifests`` further commits can find its manifest
        object deleted — size keep_manifests above the worst-case
        reader staleness measured in commits, or retry
        current_manifest on a missing object.
        NOT safe against a concurrent writer mid-attempt (its
        not-yet-committed files look like orphans), so run it under the
        same single-writer ownership as compact()."""
        keep = max(1, int(keep_manifests))
        names = sorted(self._manifest_names(spark))
        deleted = list(self.orphan_files(spark, manifest_names=names[-keep:]))
        for p in deleted:
            fs, jpath, _ = _fsutil.hadoop_fs(spark, p)
            fs.delete(jpath, False)
        for n in names[:-keep]:
            path = os.path.join(self._manifest_dir, n)
            fs, jpath, _ = _fsutil.hadoop_fs(spark, path)
            fs.delete(jpath, False)
            deleted.append(path)
        return deleted

    def orphan_files(
        self,
        spark: SparkSession,
        manifest_names: Optional[list[str]] = None,
    ) -> list[str]:
        """Data files not referenced by the winning manifest (crashed or
        superseded attempts) — safe to delete any time; listed rather
        than auto-deleted so vacuuming stays an explicit operation.
        ``manifest_names`` widens the protected set to every file any
        of those manifest objects references (vacuum passes its
        retained window so stale-but-kept manifests stay readable)."""
        referenced: set = set()
        manifests = [self.current_manifest(spark)]
        for n in manifest_names or []:
            path = os.path.join(self._manifest_dir, n)
            fs, jpath, _ = _fsutil.hadoop_fs(spark, path)
            if not fs.exists(jpath):
                continue  # raced away since listing — nothing to protect
            try:
                manifests.append(json.loads(_fsutil.read_text(spark, path)))
            except Exception as exc:
                # a retained manifest that EXISTS but cannot be read is
                # not "unprotected" — treating a transient read error as
                # empty would let vacuum delete files a stale reader of
                # that manifest still needs.  Abort; retry the vacuum.
                raise RuntimeError(
                    f"cannot read retained manifest {path}; aborting "
                    f"orphan computation rather than un-protecting its "
                    f"files"
                ) from exc
        for man in manifests:
            referenced |= {
                f for fl in man.get("batches", {}).values() for f in fl
            } | set(man.get("compacted_files", []))
        data_root = os.path.join(self.root, "data")
        fs, jroot, _ = _fsutil.hadoop_fs(spark, data_root)
        if not fs.exists(jroot):
            return []
        out = []
        for bdir in fs.listStatus(jroot):
            if not bdir.isDirectory():
                continue
            for adir in fs.listStatus(bdir.getPath()):
                if not adir.isDirectory():
                    continue
                for st in fs.listStatus(adir.getPath()):
                    p = str(st.getPath().toString())
                    if p.endswith(".parquet") and p not in referenced:
                        out.append(p)
        return sorted(out)


class IcebergSink:
    """Iceberg exactly-once append (requires iceberg-spark-runtime on
    the classpath and a configured catalog — not present in this
    sandbox, so instantiation is gated)."""

    def __init__(self, table: str) -> None:
        self.table = table

    def is_committed(self, batch_id: int, spark: Optional[SparkSession] = None) -> bool:
        """True iff a snapshot already carries this batch id — the
        idempotency read for replayed batches.  Signature matches the
        other sinks' (batch_id first, optional session) so foreachBatch
        callbacks need no per-sink signature probing."""
        spark = spark or SparkSession.getActiveSession()
        rows = spark.sql(
            f"SELECT summary['jepl.batch_id'] AS b FROM {self.table}.snapshots"
        ).collect()
        done = {int(r["b"]) for r in rows if r["b"] is not None}
        return int(batch_id) in done

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            if self.is_committed(batch_id, spark):
                return  # replay of an already-committed batch → no-op
        except Exception as exc:  # pragma: no cover - no Iceberg here
            raise RuntimeError(
                "Iceberg runtime not available; use IdempotentParquetSink"
            ) from exc
        (
            add_lineage(batch_df, batch_id)
            .writeTo(self.table)
            .option("snapshot-property.jepl.batch_id", str(int(batch_id)))
            .append()
        )

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        return self.write_batch
