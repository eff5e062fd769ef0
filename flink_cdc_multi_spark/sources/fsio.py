"""Single-file text IO that works on any Hadoop-supported filesystem.

The reference writes its offset/status files through Flink's FileSystem
abstraction, so local/HDFS/S3 all work
(java/sinkfunctions/SingleFileSinkFunction.java:31-39,
FlinkCDCMulti.java:532-537). The Spark equivalent is the Hadoop FileSystem
API reached through the session JVM — on a cluster the offset file MUST
live on shared storage or resume is broken.

Paths without a scheme take a pure-local fast path (os + tempfile, atomic
via rename, no JVM needed — unit tests of the stores run without Spark).
Paths with a scheme (``file:/``, ``hdfs://``, ``s3a://``...) go through
Hadoop FS: write to ``<path>.tmp`` then delete+rename into place — the
same overwrite contract as the reference's truncate+rewrite (object stores
make rename copy+delete; these files are tens of bytes).
"""

from __future__ import annotations

import os
import re
import tempfile

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")


def has_scheme(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def join(store_path: str, name: str) -> str:
    if has_scheme(store_path):
        return f"{store_path.rstrip('/')}/{name}"
    return os.path.join(store_path, name)


def _fs_path(path: str):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"no active SparkSession to reach Hadoop FS for {path!r}; "
            "scheme paths need a running session"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def write_text_atomic(path: str, content: str) -> None:
    if not has_scheme(path):
        parent = os.path.dirname(path)
        os.makedirs(parent, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=parent)
        with os.fdopen(fd, "w") as f:
            f.write(content)
        os.replace(tmp, path)
        return
    jvm, fs, jpath = _fs_path(path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    fs.delete(jpath, False)  # best-effort; rename below fails loudly if raced
    if not fs.rename(tmp, jpath):
        raise IOError(f"rename {path}.tmp -> {path} failed")


def write_text_create(path: str, content: str) -> None:
    """Single direct create-overwrite — ONE object PUT on S3-family
    stores, where a PUT is atomic and the tmp+delete+rename recipe of
    write_text_atomic is NOT (S3 rename is copy+delete; the delete
    opens a window where the file vanishes for readers — r15 review).
    On HDFS/local a visible-path create is the non-atomic one (readers
    can observe partial writes), so use write_text_atomic there; the
    split belongs to the caller, which knows its scheme."""
    if not has_scheme(path):  # local: os.replace IS the atomic primitive
        write_text_atomic(path, content)
        return
    jvm, fs, jpath = _fs_path(path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text(path: str) -> str | None:
    """File content, or None when the file does not exist."""
    if not has_scheme(path):
        try:
            with open(path) as f:
                return f.read()
        except FileNotFoundError:
            return None
    jvm, fs, jpath = _fs_path(path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()
