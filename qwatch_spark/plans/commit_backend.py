"""Conditional-put commit-log backends — the CAS protocol's storage seam.

SnapshotTable's CAS commit protocol (snapshot_table.py) needs exactly
four primitives from a store: atomic put-if-absent of a numbered slot,
slot listing, slot read, and slot delete. This module isolates them
behind `CasBackend` so porting to an object store is configuration, not
code:

- `LocalFSCasBackend` — slots are `_commits/m=<n>.json` files; the
  put-if-absent is `os.link` (fails EEXIST), the local-FS analog of a
  conditional put and the same trick Delta Lake's HDFS LogStore uses.
- `InMemoryCasBackend` — a process-wide dict guarded by one lock: a
  faithful fake of an object store's conditional put (S3 If-None-Match,
  GCS x-goog-if-generation-match:0, Azure If-None-Match:*). The CAS
  tests run through BOTH backends, so the protocol provably depends on
  nothing but these four calls — an S3 adapter is this class with
  boto3 instead of a dict.

The reference's analog is the single serial applier
(/root/reference/outputs/neo4j.go:474-506) — one goroutine, no commit
protocol at all; this seam is what lets many writers share a table.
"""

from __future__ import annotations

import os
import threading
import uuid


class CommitConflictError(RuntimeError):
    """A writer lost a commit race (CAS put-if-absent lost, mutation
    guard tripped). Retryable: rebase on the new manifest and retry.
    Subclasses RuntimeError so pre-existing catch sites keep working;
    NEW code must catch this type, never match on message substrings
    (an unrelated error whose text happens to contain 'stale' must not
    be silently retried)."""


class StaleBaseError(CommitConflictError):
    """The writer's base version/manifest was superseded before its
    commit — the pre-commit flavor of losing the race."""


class CasBackend:
    """Slot store for the CAS commit log. `n` is the mutation number;
    `data` is the serialized manifest JSON."""

    def put_if_absent(self, n: int, data: str) -> bool:
        """Atomically create slot `n`. False if it already exists —
        the linearization point of the whole commit protocol."""
        raise NotImplementedError

    def slots(self) -> list[int]:
        """All existing slot numbers (one LIST)."""
        raise NotImplementedError

    def read(self, n: int) -> str | None:
        raise NotImplementedError

    def delete(self, n: int) -> None:
        raise NotImplementedError


class LocalFSCasBackend(CasBackend):
    def __init__(self, table_path: str, dirname: str = "_commits"):
        self.cdir = os.path.join(table_path, dirname)

    def _slot(self, n: int) -> str:
        return os.path.join(self.cdir, f"m={int(n)}.json")

    def put_if_absent(self, n: int, data: str) -> bool:
        os.makedirs(self.cdir, exist_ok=True)
        tmp = os.path.join(self.cdir, f".{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            fh.write(data)
        try:
            os.link(tmp, self._slot(n))  # atomic create-or-EEXIST
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def slots(self) -> list[int]:
        try:
            names = os.listdir(self.cdir)
        except FileNotFoundError:
            return []
        return sorted(
            int(f[2:-5])
            for f in names
            if f.startswith("m=") and f.endswith(".json")
        )

    def read(self, n: int) -> str | None:
        try:
            with open(self._slot(n)) as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def delete(self, n: int) -> None:
        try:
            os.unlink(self._slot(n))
        except FileNotFoundError:
            pass


class InMemoryCasBackend(CasBackend):
    """Fake conditional-put store, keyed by table path so every
    SnapshotTable instance of the same table shares one slot map —
    process-lifetime only (a crash loses the log), which is exactly
    what makes it a TEST fake and a porting template, not a mode for
    production localfs use."""

    _stores: dict[str, dict[int, str]] = {}
    _lock = threading.Lock()

    def __init__(self, table_path: str):
        self.key = os.path.realpath(table_path)

    def _store(self) -> dict[int, str]:
        return self._stores.setdefault(self.key, {})

    def put_if_absent(self, n: int, data: str) -> bool:
        with self._lock:
            store = self._store()
            if int(n) in store:
                return False
            store[int(n)] = data
            return True

    def slots(self) -> list[int]:
        with self._lock:
            return sorted(self._store())

    def read(self, n: int) -> str | None:
        with self._lock:
            return self._store().get(int(n))

    def delete(self, n: int) -> None:
        with self._lock:
            self._store().pop(int(n), None)


BACKENDS = {"localfs": LocalFSCasBackend, "memory": InMemoryCasBackend}


def cas_backend(kind: str, table_path: str) -> CasBackend:
    try:
        return BACKENDS[kind](table_path)
    except KeyError:
        raise ValueError(
            f"unknown cas_backend {kind!r} (expected one of {sorted(BACKENDS)})"
        ) from None
