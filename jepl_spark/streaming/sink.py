"""Exactly-once sink via idempotent per-batch commits.

Structured Streaming's ``foreachBatch`` gives at-least-once batch
delivery with a stable ``batch_id`` per checkpoint; exactly-once is
completed by making the write idempotent on ``batch_id`` (the same
protocol Iceberg implements natively with its
``spark.sql.streaming.commit`` snapshot property — see
IdempotentSink.docstring).

This module ships two implementations behind one interface:

- ``IcebergSink``: appends with a WAP-style idempotency check — used
  when an Iceberg catalog is configured (not available in this sandbox;
  the class raises cleanly if the runtime lacks Iceberg).
- ``IdempotentParquetSink``: dependency-free fallback with the same
  semantics on any Hadoop-compatible FS:
    data    →  <root>/data/batch=<id>/...      (overwrite on replay)
    commit  →  <root>/_commits/<id>            (atomic rename marker)
  A replayed batch rewrites its own directory and re-marks; readers see
  only marked batches → exactly-once end to end.

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
# cannot rot as new stores appear; Iceberg's snapshot commit is the
# answer on object stores.
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
                "is not known to provide it — use IcebergSink for object "
                "stores"
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


class IcebergSink:
    """Iceberg exactly-once append (requires iceberg-spark-runtime on
    the classpath and a configured catalog — not present in this
    sandbox, so instantiation is gated)."""

    def __init__(self, table: str) -> None:
        self.table = table

    def is_committed(self, spark: SparkSession, batch_id: int) -> bool:
        """True iff a snapshot already carries this batch id — the
        idempotency read for replayed batches."""
        rows = spark.sql(
            f"SELECT summary['jepl.batch_id'] AS b FROM {self.table}.snapshots"
        ).collect()
        done = {int(r["b"]) for r in rows if r["b"] is not None}
        return int(batch_id) in done

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            if self.is_committed(spark, batch_id):
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
