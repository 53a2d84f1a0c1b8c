"""Filesystem indirection for the custom binary readers.

The engine's own readers (shapefile, FlatGeobuf) do their ranged reads
with plain ``open()``, which limits them to executor-local paths. On a
real cluster the data lives in object storage, so paths WITH a scheme
(``s3://``, ``hdfs://``, ``file://``, ...) route through
``pyarrow.fs.FileSystem.from_uri`` — the same Arrow filesystem layer
Spark's own datasources ride — while bare paths keep the zero-overhead
builtin. Both driver-side planning reads and executor-side split reads
go through these helpers, so a reader works identically on
``/data/x.fgb`` and ``s3://bucket/x.fgb``.

pyarrow input files are seekable binary readers with the subset of the
io protocol the readers use (read/seek/close); size comes from
``get_file_info`` instead of ``os.path.getsize``.
"""

from __future__ import annotations

import os


def has_scheme(path: str) -> bool:
    return "://" in path


def fs_open(path: str):
    """Seekable binary reader for a local path or a filesystem URI."""
    if has_scheme(path):
        from pyarrow import fs as pafs

        f, p = pafs.FileSystem.from_uri(path)
        return f.open_input_file(p)
    return open(path, "rb")


def fs_size(path: str) -> int | None:
    """File size in bytes, or None when the path does not name a file."""
    if has_scheme(path):
        from pyarrow import fs as pafs

        f, p = pafs.FileSystem.from_uri(path)
        info = f.get_file_info(p)
        if info.type != pafs.FileType.File:
            return None
        return info.size
    if not os.path.isfile(path):
        return None
    return os.path.getsize(path)
