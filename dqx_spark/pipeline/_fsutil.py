"""Hadoop-FS structural probes shared by the persisted-layout modules
(dedup_index / similarity / sketches).

The "missing path" condition used to be detected by substring-matching
exception text ('PATH_NOT_FOUND' / 'Path does not exist'), which is
brittle across Spark versions and locales and could mis-route unrelated
read failures (ADVICE r11).  These helpers route on FILESYSTEM state via
the Hadoop FS API instead: after a read fails, the caller asks "does the
path actually exist?" — a probe whose answer does not depend on how any
particular Spark version words its error.
"""
from __future__ import annotations


def hadoop_path_exists(spark, path: str) -> bool:
    """True when ``path`` exists on its filesystem (local, HDFS, object
    store — whichever the Hadoop configuration resolves the URI to)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def read_missing(spark, path: str) -> bool:
    """After ``spark.read.parquet(path)`` raised: True iff the failure is
    attributable to the path not existing — i.e. re-raise is wrong and a
    'nothing here yet' fallback is right.  Any failure over an EXISTING
    path (corrupt files, permissions, schema trouble) returns False so
    the caller re-raises instead of silently adopting a fallback."""
    return not hadoop_path_exists(spark, path)
