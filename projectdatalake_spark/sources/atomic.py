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
import random
import threading
import time


class ExclusiveCreateConflict(FileExistsError):
    """Another writer created the path first."""


# --- jittered retry backoff ------------------------------------------------
#
# The bounded metadata/hint read retries (txlog commit files, Delta commit
# JSON, Iceberg version-hint + metadata JSON) ride out the visible-before-
# written window of exclusive create. Linear lockstep sleeps re-collide
# when several threads observe the same torn file at the same instant —
# "full jitter" (sleep uniform in [floor, min(cap, base·2^attempt)])
# decorrelates them, so contention drains in O(log n) rounds instead of
# repeatedly thundering. RETRY_STATS records the worst attempt depth so
# stress tests can assert the budget is never close to exhausted.

_RETRY_BASE = 0.005
_RETRY_CAP = 0.1
_retry_lock = threading.Lock()
RETRY_STATS = {"sleeps": 0, "max_attempt": 0}


def reset_retry_stats() -> None:
    with _retry_lock:
        RETRY_STATS["sleeps"] = 0
        RETRY_STATS["max_attempt"] = 0


def backoff_sleep(attempt: int) -> float:
    """Sleep with full-jitter exponential backoff; returns the delay.

    ``attempt`` is 0-based. The floor (base/2) guarantees forward progress
    past sub-millisecond torn-write windows even when the jitter draw is
    low; the cap bounds tail latency of a deep retry."""
    hi = min(_RETRY_CAP, _RETRY_BASE * (2 ** attempt))
    d = random.uniform(_RETRY_BASE / 2, max(_RETRY_BASE / 2, hi))
    with _retry_lock:
        RETRY_STATS["sleeps"] += 1
        RETRY_STATS["max_attempt"] = max(RETRY_STATS["max_attempt"], attempt + 1)
    time.sleep(d)
    return d


def is_local_path(p: str) -> bool:
    return "://" not in p or p.startswith("file:")


def strip_file_scheme(p: str) -> str:
    if p.startswith("file://"):
        return p[len("file://") :]
    if p.startswith("file:"):
        return p[len("file:") :]
    return p


def uri_to_path(p: str) -> str:
    """Normalize a Spark ``input_file_name()`` URI to a filesystem path.

    input_file_name returns a PERCENT-ENCODED URI (a hive partition dir
    like ``o_orderpriority=4-NOT SPECIFIED`` comes back as
    ``...4-NOT%20SPECIFIED/...``), while filesystem listings yield raw
    paths. Keying a stats/count map by the encoded form and looking it
    up by the raw form silently misses every file under a partition
    value containing a space/%/# — record counts land as 0 in manifests
    and per-file min/max never attach (found round 6 via the Iceberg
    partitions metadata table over TPC-H's '4-NOT SPECIFIED')."""
    from urllib.parse import unquote

    return unquote(strip_file_scheme(p))


def list_local_files(
    root: str, suffix: str = ".parquet"
) -> list[tuple[str, int, int]]:
    """Recursive LOCAL listing via os.scandir — the py4j-free twin of
    ``FileSystem.listFiles(path, recursive=true)`` for ``file:`` roots
    (r13: the staging loops paid one driver↔JVM roundtrip per file just
    to enumerate what they had written). Returns (absolute path, size
    bytes, mtime millis), path-sorted — deterministic where Hadoop's
    local iterator order is filesystem-dependent; every consumer keys by
    path or re-sorts."""
    out: list[tuple[str, int, int]] = []
    stack = [strip_file_scheme(root)]
    while stack:
        d = stack.pop()
        with os.scandir(d) as it:
            for e in it:
                if e.is_dir(follow_symlinks=False):
                    stack.append(e.path)
                elif e.name.endswith(suffix):
                    st = e.stat()
                    out.append((e.path, st.st_size, st.st_mtime_ns // 1_000_000))
    out.sort()
    return out


def move_local_file(src: str, dst: str) -> None:
    """``mkdirs(parent(dst)) + rename(src, dst)`` for LOCAL paths in two
    syscalls instead of three py4j roundtrips. Destination names are
    uuid-unique staged part files, so the overwrite semantics of
    os.replace can never clobber a concurrent writer's output."""
    raw_dst = strip_file_scheme(dst)
    os.makedirs(os.path.dirname(raw_dst), exist_ok=True)
    os.replace(strip_file_scheme(src), raw_dst)


def delete_local_tree(p: str) -> None:
    """Recursive local delete (FileSystem.delete(path, true) twin)."""
    import shutil

    shutil.rmtree(strip_file_scheme(p), ignore_errors=True)


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
