"""Shared Hadoop FileSystem plumbing for the pipeline modules.

merge/wap/manifest each need store-agnostic file operations (delete a
partition directory, clean staging, commit manifests); three private
copies of the py4j FS idiom were drifting independently (round-5 review)
— this is the single home.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path_str: str):
    """``(jvm, fs, path)`` for a path string, resolved through the path's
    own filesystem (local, HDFS, object store — whatever the URI says)."""
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs, path


def delete_path(spark: SparkSession, path_str: str) -> bool:
    """Recursively delete ``path_str`` if it exists; True if removed."""
    _, fs, path = hadoop_fs(spark, path_str)
    if fs.exists(path):
        fs.delete(path, True)
        return True
    return False
