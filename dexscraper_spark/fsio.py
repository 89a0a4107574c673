"""Control-plane filesystem I/O that works on object storage.

The engine's DATA plane (parquet reads/writes) always goes through
Spark and is filesystem-agnostic for free. Its CONTROL plane — tiny
JSON manifests/specs, version-directory listings, `_SUCCESS` probes,
atomic directory swaps — historically used local `open`/`os.*` calls,
which throw on ``s3a://``/``abfss://``/``hdfs://`` paths (VERDICT r8
§next-1: the ONE cluster-readiness gap left). This module is the single
shared helper all those sites route through:

* **Local fast-path** — a path with no scheme (or ``file:``) uses plain
  Python ``os``/``open``/``shutil``: no JVM round-trips, and it keeps
  working where no SparkSession is handy.
* **Hadoop path** — any other scheme resolves through the JVM's
  ``org.apache.hadoop.fs.FileSystem`` for the session's Hadoop
  configuration, i.e. exactly the client Spark's own writers use, so
  every filesystem the cluster can write parquet to also serves the
  control plane (s3a, abfss, gs, hdfs, or a custom ``fs.X.impl``).

Semantics notes (same contract both paths):
* ``write_text_atomic`` writes ``<path>.tmp`` then renames over the
  destination. Local = ``os.replace`` (atomic). Hadoop = delete +
  rename — atomic on HDFS, best-effort on object stores (standard
  practice: the window is a missing-file read, never a torn one,
  because the tmp write is only renamed after a successful close).
* ``rename`` moves files OR directories and fails if dst exists
  (callers delete first — explicit, like the 2-rename swap protocol).
* ``delete`` is recursive and returns quietly when the path is absent
  (``shutil.rmtree(ignore_errors=True)`` parity).

All functions take the SparkSession first; the local fast-path accepts
``spark=None`` (pure-Python contexts like tests of the protocol logic).
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse


def _local_path(path: str) -> str | None:
    """The os-level path when ``path`` is local, else None.

    A bare path ("/data/x", "rel/x") and an explicit ``file:`` URI are
    local; any other scheme goes to Hadoop. Windows drive letters don't
    exist in this deployment target (Linux-only container), so a single
    leading letter+colon is treated as a scheme, matching Hadoop's own
    Path parsing.
    """
    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        return parsed.path if parsed.scheme == "file" else path
    return None


def _fs(spark, path: str):
    """(FileSystem, jvm Path) for ``path`` under the session's Hadoop
    conf."""
    if spark is None:
        raise ValueError(
            f"non-local path {path!r} needs an active SparkSession "
            "(Hadoop FileSystem client)")
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def join(path: str, *names: str) -> str:
    """URI-safe child join: os.path.join would mangle ``s3a://`` on
    Windows-style separators and double slashes confuse some stores."""
    out = path.rstrip("/")
    for n in names:
        out += "/" + n.strip("/")
    return out


def exists(spark, path: str) -> bool:
    lp = _local_path(path)
    if lp is not None:
        return os.path.exists(lp)
    fs, jp = _fs(spark, path)
    return bool(fs.exists(jp))


def is_dir(spark, path: str) -> bool:
    lp = _local_path(path)
    if lp is not None:
        return os.path.isdir(lp)
    fs, jp = _fs(spark, path)
    return bool(fs.exists(jp)) and bool(fs.getFileStatus(jp).isDirectory())


def list_names(spark, path: str) -> list[str]:
    """Child basenames of a directory; [] when the path is absent."""
    lp = _local_path(path)
    if lp is not None:
        return os.listdir(lp) if os.path.isdir(lp) else []
    fs, jp = _fs(spark, path)
    if not fs.exists(jp):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jp)]


def mkdirs(spark, path: str) -> None:
    lp = _local_path(path)
    if lp is not None:
        os.makedirs(lp, exist_ok=True)
        return
    fs, jp = _fs(spark, path)
    fs.mkdirs(jp)


def delete(spark, path: str) -> None:
    """Recursive delete; silent no-op when absent."""
    lp = _local_path(path)
    if lp is not None:
        if os.path.isdir(lp) and not os.path.islink(lp):
            shutil.rmtree(lp, ignore_errors=True)
        elif os.path.exists(lp) or os.path.islink(lp):
            try:
                os.remove(lp)
            except OSError:
                pass
        return
    fs, jp = _fs(spark, path)
    if fs.exists(jp):
        fs.delete(jp, True)


def rename(spark, src: str, dst: str) -> None:
    """Move a file or directory. Raises if src is missing or dst exists
    (delete dst first — the swap protocols do this explicitly)."""
    ls, ld = _local_path(src), _local_path(dst)
    if ls is not None and ld is not None:
        if os.path.exists(ld):
            raise FileExistsError(f"rename target exists: {dst}")
        os.rename(ls, ld)
        return
    if (ls is None) != (ld is None):
        raise ValueError(
            f"rename across filesystems is not a rename: {src} -> {dst}")
    fs, jsrc = _fs(spark, src)
    _, jdst = _fs(spark, dst)
    if fs.exists(jdst):
        raise FileExistsError(f"rename target exists: {dst}")
    if not fs.rename(jsrc, jdst):
        # Hadoop rename() reports failure as a boolean
        raise OSError(f"rename failed: {src} -> {dst}")


def read_text(spark, path: str) -> str:
    lp = _local_path(path)
    if lp is not None:
        with open(lp) as f:
            return f.read()
    fs, jp = _fs(spark, path)
    stream = fs.open(jp)
    try:
        jvm = spark._jvm
        baos = jvm.java.io.ByteArrayOutputStream()
        # Hadoop's own IOUtils — guaranteed on Spark's classpath
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536,
                                                   False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def write_text_atomic(spark, path: str, text: str) -> None:
    """Write ``path`` via a same-directory tmp + rename, so a crash
    mid-dump can never leave a truncated file that bricks later readers
    (the versioned-fold `_spec.json` contract)."""
    lp = _local_path(path)
    if lp is not None:
        tmp = lp + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, lp)
        return
    fs, jp = _fs(spark, path)
    _, jtmp = _fs(spark, path + ".tmp")
    out = fs.create(jtmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(jp):
        fs.delete(jp, False)
    if not fs.rename(jtmp, jp):
        raise OSError(f"rename failed publishing {path}")
