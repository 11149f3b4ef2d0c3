"""Pluggable filesystem layer (pyarrow.fs) + the rename-free commit
protocol shared by the band library and the pipeline checkpoints.

The reference's library is plain files owned by one node
(/root/reference/main_map.cpp:859-1132). Multi-node durable state here
must also work on object stores (S3/GCS), which have NO atomic rename
and NO reliable mtime: correctness therefore comes from a MANIFEST
commit, not directory swaps —

  1. writers write immutable data files under generation-unique names
     (`part-00003-<gen>.parquet`): never overwritten, so readers can
     cache by name alone;
  2. the manifest (`_meta.json` / `_manifest.json`) names the exact
     files of the current snapshot and is written LAST as one
     single-object PUT — the commit point (object-store PUTs are
     atomic: a reader sees the old snapshot or the new one, never a
     torn mix);
  3. files retired by the previous commit are kept for one generation
     (readers holding the prior manifest stay valid), older orphans
     are garbage-collected best-effort on the next commit.

Every path goes through `resolve_fs`, so tests inject
pa.fs.LocalFileSystem via plain paths and production points the same
code at `s3://...` URIs.
"""

from __future__ import annotations

import json
import posixpath

import pyarrow.fs as pafs


class ObjectStoreDoubleHandler(pafs.FileSystemHandler):
    """Local-disk double that ENFORCES object-store semantics: move /
    rename raises (S3/GCS have none) and every FileInfo is returned
    with its mtime stripped (object-store listings give no reliable
    mtime). Backs the `norename://` scheme below so the manifest
    protocol's no-rename, no-mtime contract is executable in tests
    without a real object store. Stateless (reconstructs its local
    delegate), so it pickles into Ray workers by construction."""

    def __init__(self):
        self._local = pafs.LocalFileSystem()

    def __reduce__(self):
        return (ObjectStoreDoubleHandler, ())

    def __eq__(self, other):
        return isinstance(other, ObjectStoreDoubleHandler)

    def get_type_name(self):
        return "norename"

    def normalize_path(self, path):
        return self._local.normalize_path(path)

    @staticmethod
    def _strip(info):
        return pafs.FileInfo(info.path, type=info.type, size=info.size)

    def get_file_info(self, paths):
        return [self._strip(i) for i in self._local.get_file_info(paths)]

    def get_file_info_selector(self, selector):
        return [self._strip(i) for i in self._local.get_file_info(selector)]

    def create_dir(self, path, recursive):
        self._local.create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self._local.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._local.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        raise NotImplementedError("refusing to clear /")

    def delete_file(self, path):
        self._local.delete_file(path)

    def move(self, src, dest):
        raise NotImplementedError(
            "object stores have no rename — commit via a single-object "
            "manifest PUT instead (fsio module docstring)"
        )

    def copy_file(self, src, dest):
        self._local.copy_file(src, dest)

    def open_input_stream(self, path):
        return self._local.open_input_stream(path)

    def open_input_file(self, path):
        return self._local.open_input_file(path)

    def open_output_stream(self, path, metadata):
        return self._local.open_output_stream(path, metadata=metadata)

    def open_append_stream(self, path, metadata):
        raise NotImplementedError("object stores have no append")


def resolve_fs(path: str) -> tuple[pafs.FileSystem, str]:
    """(filesystem, fs-local path) for a plain path or a URI.

    `norename://<abs-path>` resolves to the ObjectStoreDouble above —
    same bytes on local disk, object-store rules enforced. Workers
    resolve the scheme independently from the path string, so no
    filesystem object needs to cross process boundaries."""
    s = str(path)
    if s.startswith("norename://"):
        return pafs.PyFileSystem(ObjectStoreDoubleHandler()), s[len("norename://"):]
    if "://" in s:
        fs, p = pafs.FileSystem.from_uri(s)
        return fs, p
    return pafs.LocalFileSystem(), s


def join(base: str, *parts: str) -> str:
    # fs-local paths are always /-separated (LocalFileSystem on posix,
    # and every object store)
    return posixpath.join(base, *parts)


def exists(fs: pafs.FileSystem, path: str) -> bool:
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def mkdirs(fs: pafs.FileSystem, path: str) -> None:
    fs.create_dir(path, recursive=True)


def write_json(fs: pafs.FileSystem, path: str, obj) -> None:
    """Single-object write — the commit-point primitive.

    Object stores give atomicity for free (a PUT is all-or-nothing).
    LocalFileSystem does NOT — open_output_stream truncates in place,
    so a crash mid-write would tear the manifest the previous snapshot
    depends on. There the write goes to a temp name in the same
    directory and is published with one rename (POSIX-atomic replace)."""
    payload = json.dumps(obj).encode()
    if isinstance(fs, pafs.LocalFileSystem):
        import uuid

        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with fs.open_output_stream(tmp) as f:
            f.write(payload)
        fs.move(tmp, path)
    else:
        with fs.open_output_stream(path) as f:
            f.write(payload)


def read_json(fs: pafs.FileSystem, path: str):
    with fs.open_input_stream(path) as f:
        return json.loads(f.read().decode())


def write_marker(fs: pafs.FileSystem, path: str, body: str = "") -> None:
    with fs.open_output_stream(path) as f:
        f.write(body.encode())


def list_files(fs: pafs.FileSystem, dirpath: str) -> list[str]:
    """Base names of plain files directly under dirpath ([] if absent)."""
    try:
        infos = fs.get_file_info(pafs.FileSelector(dirpath, recursive=False))
    except FileNotFoundError:
        return []
    return sorted(
        posixpath.basename(i.path) for i in infos if i.type == pafs.FileType.File
    )


def delete_files_best_effort(fs: pafs.FileSystem, paths: list[str]) -> None:
    for p in paths:
        try:
            fs.delete_file(p)
        except Exception:
            pass  # GC is advisory; the manifest alone defines the snapshot
