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
  GCS x-goog-if-generation-match:0, Azure If-None-Match:*).
- `S3CasBackend` — the S3 adapter itself, speaking boto3's client
  surface (`put_object(IfNoneMatch="*")`, paginated `list_objects_v2`,
  `get_object`, `delete_object`) with S3's real error semantics (412
  PreconditionFailed = CAS lost, 409 ConditionalRequestConflict =
  in-flight rival, re-poll). The client object is pluggable: the test
  suite injects `FakeS3Client` (below) and runs the ENTIRE
  backend-parametrized protocol suite through it; production uses the
  default boto3 client — the port is configuration, not code.

The CAS tests run through ALL backends, so the protocol provably
depends on nothing but these four calls.

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


class S3ClientError(Exception):
    """botocore.exceptions.ClientError shape: `.response["Error"]["Code"]`
    carries the S3 error code. FakeS3Client raises this; a real boto3
    client raises botocore's ClientError, which has the identical
    attribute — S3CasBackend only ever reads `.response`."""

    def __init__(self, code: str, message: str = ""):
        super().__init__(f"{code}: {message}")
        self.response = {"Error": {"Code": code, "Message": message}}


class FakeS3Client:
    """Minimal in-repo fake of the boto3 S3 client surface the CAS
    protocol needs — conditional `put_object(IfNoneMatch="*")` (S3's
    compare-and-swap, generally available since Aug 2024), paginated
    `list_objects_v2`, `get_object` (incl. ranged reads),
    `head_object`, `delete_object`. Objects are stored as BYTES so the
    same fake serves both the JSON commit log and the parquet data
    files the metadata fast paths footer-read (plans/datafs.py).

    Object maps are class-level and keyed by bucket so every client
    instance in the process shares one store — the same property a real
    bucket has across SDK clients, and what lets two SnapshotTable
    instances of the same s3:// table race each other in tests.
    `page_size` defaults to 2 so the list-pagination loop in
    S3CasBackend.slots() is exercised by EVERY test, not just a
    hypothetical >1000-slot table."""

    _buckets: dict[str, dict[str, bytes]] = {}
    _lock = threading.Lock()

    def __init__(self, page_size: int = 2):
        self.page_size = int(page_size)

    def _bucket(self, name: str) -> dict[str, bytes]:
        return self._buckets.setdefault(name, {})

    def put_object(self, Bucket: str, Key: str, Body, IfNoneMatch: str | None = None):
        data = (
            bytes(Body)
            if isinstance(Body, (bytes, bytearray))
            else str(Body).encode()
        )
        with self._lock:
            objs = self._bucket(Bucket)
            if IfNoneMatch == "*" and Key in objs:
                raise S3ClientError("PreconditionFailed", Key)
            objs[Key] = data
        return {}

    def list_objects_v2(
        self,
        Bucket: str,
        Prefix: str = "",
        ContinuationToken: str | None = None,
        MaxKeys: int | None = None,
    ):
        with self._lock:
            objs = self._bucket(Bucket)
            keys = sorted(k for k in objs if k.startswith(Prefix))
            sizes = {k: len(objs[k]) for k in keys}
        if ContinuationToken is not None:
            keys = [k for k in keys if k > ContinuationToken]
        page = keys[: MaxKeys or self.page_size]
        out: dict = {
            "Contents": [{"Key": k, "Size": sizes[k]} for k in page]
        }
        if len(keys) > len(page):
            out["IsTruncated"] = True
            out["NextContinuationToken"] = page[-1]
        else:
            out["IsTruncated"] = False
        return out

    def get_object(self, Bucket: str, Key: str, Range: str | None = None):
        import io

        with self._lock:
            objs = self._bucket(Bucket)
            if Key not in objs:
                raise S3ClientError("NoSuchKey", Key)
            data = objs[Key]
        if Range is not None:
            # "bytes=a-b", inclusive, like S3
            spec = Range.split("=", 1)[1]
            a, _, b = spec.partition("-")
            data = data[int(a): int(b) + 1]
        return {"Body": io.BytesIO(data)}

    def head_object(self, Bucket: str, Key: str):
        with self._lock:
            objs = self._bucket(Bucket)
            if Key not in objs:
                # REAL S3 semantics: HEAD responses have no body, so
                # botocore surfaces the bare HTTP status "404", never
                # "NoSuchKey" (that code only appears on GET/DELETE,
                # whose error bodies carry it) — the fake must match or
                # every exists() check passes tests and breaks in prod
                raise S3ClientError("404", Key)
            return {"ContentLength": len(objs[Key])}

    def delete_object(self, Bucket: str, Key: str):
        with self._lock:
            self._bucket(Bucket).pop(Key, None)
        return {}

    def copy_object(self, Bucket: str, Key: str, CopySource: dict):
        """Server-side copy (the object store's 'rename'): CopySource is
        boto3's {"Bucket": ..., "Key": ...} form."""
        with self._lock:
            src = self._bucket(CopySource["Bucket"]).get(CopySource["Key"])
            if src is None:
                raise S3ClientError("NoSuchKey", CopySource["Key"])
            self._bucket(Bucket)[Key] = src
        return {}


class DirBackedFakeS3Client:
    """The boto3 client surface over a REAL directory: object
    `bucket/key` is the file `<root>/bucket/key`. What it exists for —
    the ANN serving indexes' data plane is read AND written by SPARK
    (probes scan part files, appends/maintenance write them), so a
    purely in-memory fake cannot exercise the index protocol
    end-to-end. Rooting the fake at a directory gives the test the same
    two-views-of-one-store shape a real deployment has: Spark reads and
    writes through the filesystem path (production: the s3a connector
    against the bucket), while the protocol's control plane — pointer
    publishes, conditional-put claims, LISTs, ranged GETs, copy folds —
    speaks the boto3 surface against the SAME bytes.

    Semantics match S3 where the protocol depends on them:
      - `put_object` is atomic-visibility (tmp file + os.replace) —
        readers never see a torn object;
      - `put_object(IfNoneMatch="*")` is a true cross-PROCESS CAS
        (O_CREAT|O_EXCL), so multi-process stress tests are honest;
      - listings are lexicographic with Size + LastModified and
        paginate (page_size=2 default, like FakeS3Client, so every
        test exercises the pagination loop);
      - `copy_object` copies bytes (no rename shortcut — object stores
        have no rename, and the protocol must not assume one).
    Directories as such don't exist: empty dirs are invisible to
    listings, exactly like prefixes on S3."""

    def __init__(self, root: str, page_size: int = 2):
        self.root = os.path.realpath(root)
        self.page_size = int(page_size)

    def _path(self, bucket: str, key: str) -> str:
        p = os.path.realpath(os.path.join(self.root, bucket, key))
        if not p.startswith(self.root + os.sep):
            raise ValueError(f"key escapes the store root: {bucket}/{key}")
        return p

    def put_object(self, Bucket: str, Key: str, Body, IfNoneMatch: str | None = None):
        data = (
            bytes(Body)
            if isinstance(Body, (bytes, bytearray))
            else str(Body).encode()
        )
        dst = self._path(Bucket, Key)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if IfNoneMatch == "*":
            try:  # O_EXCL: atomic create-or-fail, across processes
                fd = os.open(dst, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
            except FileExistsError:
                raise S3ClientError("PreconditionFailed", Key) from None
            with os.fdopen(fd, "wb") as fh:
                fh.write(data)
            return {}
        tmp = f"{dst}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, dst)  # atomic visibility, like an S3 put
        return {}

    def _keys(self, bucket: str, prefix: str) -> list[str]:
        base = os.path.join(self.root, bucket)
        out = []
        for dirpath, _dirs, files in os.walk(base):
            for f in files:
                if f.endswith(".tmp"):
                    continue  # in-flight atomic puts are not objects
                key = os.path.relpath(os.path.join(dirpath, f), base)
                if key.startswith(prefix):
                    out.append(key)
        return sorted(out)

    def list_objects_v2(
        self,
        Bucket: str,
        Prefix: str = "",
        ContinuationToken: str | None = None,
        MaxKeys: int | None = None,
    ):
        keys = self._keys(Bucket, Prefix)
        if ContinuationToken is not None:
            keys = [k for k in keys if k > ContinuationToken]
        page = keys[: MaxKeys or self.page_size]
        contents = []
        for k in page:
            p = self._path(Bucket, k)
            try:
                st = os.stat(p)
            except OSError:
                continue  # deleted between walk and stat
            contents.append(
                {"Key": k, "Size": st.st_size, "LastModified": st.st_mtime}
            )
        out: dict = {"Contents": contents}
        if len(keys) > len(page):
            out["IsTruncated"] = True
            out["NextContinuationToken"] = page[-1]
        else:
            out["IsTruncated"] = False
        return out

    def get_object(self, Bucket: str, Key: str, Range: str | None = None):
        import io

        try:
            with open(self._path(Bucket, Key), "rb") as fh:
                data = fh.read()
        except FileNotFoundError:
            raise S3ClientError("NoSuchKey", Key) from None
        if Range is not None:
            spec = Range.split("=", 1)[1]
            a, _, b = spec.partition("-")
            data = data[int(a): int(b) + 1]
        return {"Body": io.BytesIO(data)}

    def head_object(self, Bucket: str, Key: str):
        p = self._path(Bucket, Key)
        if not os.path.isfile(p):  # a prefix/dir is not an object
            # "404", not "NoSuchKey" — real S3 HEAD errors carry only
            # the HTTP status (see FakeS3Client.head_object)
            raise S3ClientError("404", Key)
        return {"ContentLength": os.path.getsize(p)}

    def delete_object(self, Bucket: str, Key: str):
        try:
            os.unlink(self._path(Bucket, Key))
        except (FileNotFoundError, IsADirectoryError):
            # a prefix is not an object on S3: deleting it is a no-op
            # (empty dirs the unlinks leave behind are likewise
            # invisible to listings, so they need no cleanup)
            pass
        return {}

    def copy_object(self, Bucket: str, Key: str, CopySource: dict):
        try:
            with open(
                self._path(CopySource["Bucket"], CopySource["Key"]), "rb"
            ) as fh:
                data = fh.read()
        except FileNotFoundError:
            raise S3ClientError("NoSuchKey", CopySource["Key"]) from None
        # keyword form, like every boto3 call — subclasses wrap these
        # methods with **kw signatures (latency models, call counters)
        return self.put_object(Bucket=Bucket, Key=Key, Body=data)


def s3_client():
    """The ONE way every driver-side seam (CAS commit log, datafs,
    indexfs) builds its S3 client: the `S3CasBackend.client_factory`
    hook if installed (tests → the in-repo fakes), else a default boto3
    client; None when neither is available. Centralized because client
    construction is exactly the kind of logic that drifts when copied —
    a config change (region, retries, endpoint) applied to one copy
    silently misses the others."""
    if S3CasBackend.client_factory is not None:
        return S3CasBackend.client_factory()
    try:  # pragma: no cover - no boto3/object store in this sandbox
        import boto3  # type: ignore[import-not-found]
    except ImportError:
        return None
    return boto3.client("s3")  # pragma: no cover


def iter_s3_keys(client, bucket: str, prefix: str):
    """Paginated `list_objects_v2` as a generator of Contents entries —
    the one pagination loop every seam shares (1000 keys per round-trip
    on real S3; the fakes page at 2 so every caller exercises the
    continuation path)."""
    token: str | None = None
    while True:
        kw = {"Bucket": bucket, "Prefix": prefix}
        if token is not None:
            kw["ContinuationToken"] = token
        resp = client.list_objects_v2(**kw)
        yield from resp.get("Contents", [])
        if not resp.get("IsTruncated"):
            return
        token = resp["NextContinuationToken"]


class S3CasBackend(CasBackend):
    """CAS slot store on S3 conditional writes: slot `n` is the object
    `<prefix>/_commits/m=<n>.json`, put-if-absent is
    `put_object(..., IfNoneMatch="*")` — S3 returns 412
    PreconditionFailed when the key exists (CAS lost) and may return
    409 ConditionalRequestConflict while a concurrent conditional write
    to the same key is in flight (undecided — re-poll until the winner
    lands). Both map onto the same boolean this protocol needs.

    `table_path` may be `s3://bucket/prefix` or a plain path (bucket
    falls back to `cas`, the path becomes the prefix) so the
    backend-parametrized protocol tests run unchanged. The client is
    pluggable via the `client_factory` class hook: tests install
    `FakeS3Client`; production leaves the default, which builds a real
    boto3 client — making the port "swap the client object", nothing
    else."""

    dirname = "_commits"
    client_factory = None  # set to a callable returning a client

    def __init__(self, table_path: str, client=None):
        if table_path.startswith("s3://"):
            rest = table_path[5:]
            bucket, _, prefix = rest.partition("/")
        else:
            bucket, prefix = "cas", os.path.realpath(table_path).lstrip("/")
        self.bucket = bucket
        self.prefix = f"{prefix.rstrip('/')}/{self.dirname}/"
        if client is not None:
            self.client = client
        elif S3CasBackend.client_factory is not None:
            self.client = S3CasBackend.client_factory()
        else:  # pragma: no cover - no object store in this sandbox
            import boto3  # type: ignore[import-not-found]

            self.client = boto3.client("s3")

    def _key(self, n: int) -> str:
        return f"{self.prefix}m={int(n)}.json"

    @staticmethod
    def _code(exc) -> str:
        return getattr(exc, "response", {}).get("Error", {}).get("Code", "")

    def put_if_absent(self, n: int, data: str) -> bool:
        import random
        import time as _time

        for attempt in range(64):
            try:
                self.client.put_object(
                    Bucket=self.bucket,
                    Key=self._key(n),
                    Body=data.encode(),
                    IfNoneMatch="*",
                )
                return True
            except Exception as exc:
                code = self._code(exc)
                if code == "PreconditionFailed":
                    # slot exists. The AMBIGUOUS-SUCCESS case: if OUR
                    # conditional write landed but its 200 was lost
                    # (SDK-level retry re-sent the put and now sees the
                    # key), the slot holds OUR payload — treating that
                    # as a loss would abort an epoch that actually
                    # committed. Read the slot back: content == our
                    # payload is a win.
                    return self.read(n) == data
                if code == "ConditionalRequestConflict":
                    # concurrent conditional write in flight; outcome
                    # undecided — re-poll (bounded) until a winner
                    # lands, with jittered exponential backoff so
                    # contending writers don't hot-loop against S3
                    _time.sleep(
                        random.uniform(0, min(0.2 * (2 ** min(attempt, 6)),
                                              2.0))
                    )
                    continue
                raise
        # exhaustion: same ambiguity applies — check whether our write
        # actually landed before declaring the commit dead
        if self.read(n) == data:
            return True
        raise CommitConflictError(
            f"slot {n}: conditional-write conflict did not settle"
        )

    def slots(self) -> list[int]:
        out: list[int] = []
        token: str | None = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": self.prefix}
            if token is not None:
                kw["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kw)
            for obj in resp.get("Contents", []):
                name = obj["Key"][len(self.prefix):]
                if name.startswith("m=") and name.endswith(".json"):
                    out.append(int(name[2:-5]))
            if not resp.get("IsTruncated"):
                return sorted(out)
            token = resp["NextContinuationToken"]

    def read(self, n: int) -> str | None:
        try:
            resp = self.client.get_object(Bucket=self.bucket, Key=self._key(n))
        except Exception as exc:
            if self._code(exc) == "NoSuchKey":
                return None
            raise
        return resp["Body"].read().decode()

    def delete(self, n: int) -> None:
        self.client.delete_object(Bucket=self.bucket, Key=self._key(n))


BACKENDS = {
    "localfs": LocalFSCasBackend,
    "memory": InMemoryCasBackend,
    "s3": S3CasBackend,
}


def cas_backend(kind: str, table_path: str) -> CasBackend:
    try:
        return BACKENDS[kind](table_path)
    except KeyError:
        raise ValueError(
            f"unknown cas_backend {kind!r} (expected one of {sorted(BACKENDS)})"
        ) from None
