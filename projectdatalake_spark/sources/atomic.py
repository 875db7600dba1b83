"""Atomic exclusive-create — the commit point of every table format here.

Optimistic commit protocols (txlog, Delta, Iceberg) rely on "create this
version file ONLY if it does not exist" for mutual exclusion. Hadoop's
``RawLocalFileSystem.create(path, overwrite=false)`` implements that as
check-then-create — a TOCTOU window in which two racing writers both pass
the exists() check and both stream into the SAME version file, the later
close silently winning: a committed snapshot vanishes with no conflict
raised (reproduced ~1/12 under six racing appends in
tests/test_iceberg_interop.py::test_concurrent_appends_no_lost_snapshots).

For local paths the fix is the kernel's own primitive: ``O_CREAT|O_EXCL``
open is atomic on POSIX, so exactly one writer wins and every loser gets
``FileExistsError``. Non-local filesystems keep the Hadoop ``fs.create``
path — HDFS create IS atomic at the NameNode, and object-store semantics
are connector-specific (conditional PUT) — this module only closes the
local-FS hole the sandbox (and any local-mode deployment) actually runs
on.

Side effect accepted: files written through the POSIX path carry no
Hadoop ``.crc`` sidecar. ChecksumFileSystem verifies only when a sidecar
exists, so mixed trees stay readable; every reader in this repo already
tolerates (and retries) checksum mismatches from non-atomic overwrites.
"""

from __future__ import annotations

import os


class ExclusiveCreateConflict(FileExistsError):
    """Another writer created the path first."""


def is_local_path(p: str) -> bool:
    return "://" not in p or p.startswith("file:")


def strip_file_scheme(p: str) -> str:
    if p.startswith("file://"):
        return p[len("file://") :]
    if p.startswith("file:"):
        return p[len("file:") :]
    return p


def write_exclusive_local(p: str, data: bytes) -> None:
    """Atomically create ``p`` (O_CREAT|O_EXCL) and write ``data``.

    Raises ``ExclusiveCreateConflict`` if the file already exists —
    exactly one of any number of racing writers succeeds.
    """
    raw = strip_file_scheme(p)
    os.makedirs(os.path.dirname(raw), exist_ok=True)
    try:
        fd = os.open(raw, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as exc:
        raise ExclusiveCreateConflict(p) from exc
    with os.fdopen(fd, "wb") as f:
        f.write(data)
