"""Shared Hadoop FileSystem helpers (py4j).

Small-file text I/O and path operations that must work on ANY
Hadoop-compatible filesystem (local, file://, hdfs://, viewfs://) —
driver-local ``open()`` breaks the moment a path carries a scheme.
Used by the exactly-once sink (commit markers) and the ANN indexes
(metadata sidecars).

py4j pitfalls encoded here once: primitive arrays pass BY VALUE (a
Python bytearray handed to ``InputStream.read`` is never written
back — drain streams JVM-side via commons-io), and
``FileSystem.rename`` reports most failures by returning false, not
raising.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path, jvm) for a path string."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def write_text(spark: SparkSession, path: str, content: str) -> None:
    fs, jpath, _ = hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    fs, jpath, _ = hadoop_fs(spark, path)
    stream = fs.open(jpath)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic rename; raises on the false-return failure mode."""
    fs, jsrc, jvm = hadoop_fs(spark, src)
    if not fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst)):
        raise IOError(f"rename failed: {src} -> {dst}")
