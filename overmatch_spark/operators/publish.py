"""K6: object-store publish of the PMTiles serving artifact.

The reference uploads its archive with boto3 and serving headers
(`/root/reference/api/upload_pmtiles.py:176-254`: ContentType
application/vnd.pmtiles, CacheControl public/max-age=86400, source
metadata).  This module implements the publish step behind a small
store interface so the ONLY thing the sandbox stubs is the network:

- ``LocalObjectStore`` — filesystem backend with the same put
  semantics (bytes + headers sidecar, md5 etag, idempotent re-put);
  fully tested.
- ``S3ObjectStore`` — the real backend, constructed only if boto3 is
  importable (it is not baked into this sandbox); same interface, so
  swapping it in changes no call sites.

Publish is IDEMPOTENT: a re-publish of identical bytes is detected
via the content md5 and skipped — the same resume philosophy as the
reference's ``--skip-existing`` load path.

Crash consistency: the object bytes are renamed into place BEFORE
the headers sidecar, and ``head`` treats an object without its
sidecar as absent.  A crash between the two renames therefore leaves
a half-published object that the next publish re-puts (self-healing);
the reverse order would pin stale bytes behind a fresh etag forever.
"""

from __future__ import annotations

import hashlib
import json
import os

# Same serving headers as the reference upload (cited above); the
# ContentType is the registered PMTiles media type.
PMTILES_HEADERS = {
    "ContentType": "application/vnd.pmtiles",
    "CacheControl": "public, max-age=86400",
    "Metadata": {"source": "overmatch", "format": "pmtiles"},
}


def _md5_file(path: str) -> str:
    md5 = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            md5.update(chunk)
    return md5.hexdigest()


class LocalObjectStore:
    """Filesystem object store: <root>/<bucket>/<key> plus a
    ``.headers.json`` sidecar. ``put_file`` returns the md5 etag of
    the bytes it actually copied."""

    def __init__(self, root: str):
        self.root = root

    def _obj(self, bucket: str, key: str) -> str:
        return os.path.join(self.root, bucket, key)

    def head(self, bucket: str, key: str) -> dict | None:
        p = self._obj(bucket, key)
        # An object without its sidecar is a half-finished publish
        # (crash between the two renames) — report absent so the
        # next publish repairs it.
        if not os.path.exists(p) or not os.path.exists(p + ".headers.json"):
            return None
        with open(p + ".headers.json") as f:
            meta = json.load(f)
        return meta

    def put_file(
        self,
        path: str,
        bucket: str,
        key: str,
        headers: dict,
        etag: str | None = None,
    ) -> str:
        """Copy ``path`` into the store, hashing the stream as it is
        copied.  If the caller passes the ``etag`` it computed for
        the skip check, a mismatch (file mutated between hash and
        copy, or a torn read) aborts before anything is renamed."""
        p = self._obj(bucket, key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        md5 = hashlib.md5()
        with open(path, "rb") as src, open(p + ".tmp", "wb") as dst:
            while True:
                chunk = src.read(1 << 20)
                if not chunk:
                    break
                md5.update(chunk)
                dst.write(chunk)
        got = md5.hexdigest()
        if etag is not None and got != etag:
            os.remove(p + ".tmp")
            raise IOError(
                f"source changed during publish: copied md5 {got} != "
                f"expected {etag}"
            )
        with open(p + ".headers.json.tmp", "w") as f:
            json.dump({**headers, "ETag": got}, f, sort_keys=True)
        # Bytes first, sidecar second: a crash in between reads as
        # "absent" via head() and is re-put on the next run. On an
        # OVERWRITE the old sidecar must be removed BEFORE the bytes
        # swap — otherwise a crash in the window between the two
        # replaces leaves NEW bytes paired with the OLD sidecar, and
        # head() would serve the stale ETag forever (a later publish
        # of content matching that stale ETag would be skipped and
        # never repair the pair).
        try:
            os.remove(p + ".headers.json")
        except FileNotFoundError:
            pass
        os.replace(p + ".tmp", p)
        os.replace(p + ".headers.json.tmp", p + ".headers.json")
        return got


class S3ObjectStore:
    """boto3 backend (same interface). Import-gated: boto3 is not in
    this sandbox, so construction raises a clear error here; on a
    real deployment this is the only line that changes.

    Multipart caveat: S3's ``ETag`` for multipart uploads (the
    default for archives >= 8 MB) is NOT the content md5, so the
    content md5 is stored in object metadata (``x-amz-meta-md5``)
    and ``head`` reports THAT as the comparison etag — otherwise the
    idempotent-skip check would never match and every pipeline rerun
    would re-upload the full archive."""

    def __init__(self, region: str = "us-east-1"):
        try:
            import boto3
        except ImportError as e:  # pragma: no cover - sandbox
            raise NotImplementedError(
                "boto3 is not available in this sandbox; use "
                "LocalObjectStore or install boto3 for real S3 publish"
            ) from e
        self._s3 = boto3.Session(region_name=region).client("s3")

    def head(self, bucket: str, key: str) -> dict | None:  # pragma: no cover
        try:
            h = self._s3.head_object(Bucket=bucket, Key=key)
        except Exception:
            return None
        meta = h.get("Metadata") or {}
        # Prefer the stored content md5; fall back to the raw ETag
        # (correct only for single-part puts).
        return {"ETag": meta.get("md5") or h["ETag"].strip('"')}

    def put_file(self, path, bucket, key, headers, etag=None):  # pragma: no cover
        # Hash the file ourselves even when the caller supplied an
        # etag: returning the caller's value verbatim would make the
        # publisher's post-put cross-check a tautology, and a file
        # mutated between the caller's hash and this upload would go
        # undetected. The re-hash is what gets stored and returned.
        got = _md5_file(path)
        if etag is not None and got != etag:
            raise IOError(
                f"source changed before upload: md5 {got} != "
                f"expected {etag}"
            )
        extra = dict(headers)
        extra["Metadata"] = {**extra.get("Metadata", {}), "md5": got}
        self._s3.upload_file(path, bucket, key, ExtraArgs=extra)
        return got


def publish_pmtiles(
    path: str,
    bucket: str,
    key: str | None = None,
    store=None,
    headers: dict | None = None,
) -> dict:
    """Publish a PMTiles archive. Returns {url-ish key, etag, skipped}.

    Idempotent: if the store already holds an object with the same
    content md5, the upload is skipped (re-running a pipeline
    re-publishes nothing).  The archive is hashed once for the skip
    check; on a real put the store re-hashes the copy stream and
    cross-checks against this value."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    key = key or os.path.basename(path)
    headers = headers or PMTILES_HEADERS
    if store is None:
        store = S3ObjectStore()
    etag = _md5_file(path)
    existing = store.head(bucket, key)
    if existing is not None and existing.get("ETag") == etag:
        return {"bucket": bucket, "key": key, "etag": etag, "skipped": True}
    got = store.put_file(path, bucket, key, headers, etag=etag)
    if got != etag:
        raise IOError(f"etag mismatch after put: {got} != {etag}")
    return {"bucket": bucket, "key": key, "etag": etag, "skipped": False}
