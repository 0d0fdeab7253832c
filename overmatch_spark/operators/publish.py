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
via the etag and skipped — the same resume philosophy as the
reference's ``--skip-existing`` load path.
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


class LocalObjectStore:
    """Filesystem object store: <root>/<bucket>/<key> plus a
    ``.headers.json`` sidecar. ``put_file`` returns the md5 etag."""

    def __init__(self, root: str):
        self.root = root

    def _obj(self, bucket: str, key: str) -> str:
        return os.path.join(self.root, bucket, key)

    def head(self, bucket: str, key: str) -> dict | None:
        p = self._obj(bucket, key)
        if not os.path.exists(p):
            return None
        with open(p + ".headers.json") as f:
            meta = json.load(f)
        return meta

    def put_file(
        self, path: str, bucket: str, key: str, headers: dict
    ) -> str:
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
        etag = md5.hexdigest()
        with open(p + ".headers.json.tmp", "w") as f:
            json.dump({**headers, "ETag": etag}, f, sort_keys=True)
        # object visible only with its headers (atomic pair rename)
        os.replace(p + ".headers.json.tmp", p + ".headers.json")
        os.replace(p + ".tmp", p)
        return etag


class S3ObjectStore:
    """boto3 backend (same interface). Import-gated: boto3 is not in
    this sandbox, so construction raises a clear error here; on a
    real deployment this is the only line that changes."""

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
        return {"ETag": h["ETag"].strip('"')}

    def put_file(self, path, bucket, key, headers):  # pragma: no cover
        self._s3.upload_file(path, bucket, key, ExtraArgs=headers)
        with open(path, "rb") as f:
            return hashlib.md5(f.read()).hexdigest()


def publish_pmtiles(
    path: str,
    bucket: str,
    key: str | None = None,
    store=None,
    headers: dict | None = None,
) -> dict:
    """Publish a PMTiles archive. Returns {url-ish key, etag, skipped}.

    Idempotent: if the store already holds an object with the same
    etag, the upload is skipped (re-running a pipeline re-publishes
    nothing)."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    key = key or os.path.basename(path)
    headers = headers or PMTILES_HEADERS
    if store is None:
        store = S3ObjectStore()
    md5 = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            md5.update(chunk)
    etag = md5.hexdigest()
    existing = store.head(bucket, key)
    if existing is not None and existing.get("ETag") == etag:
        return {"bucket": bucket, "key": key, "etag": etag, "skipped": True}
    got = store.put_file(path, bucket, key, headers)
    if got != etag:
        raise IOError(f"etag mismatch after put: {got} != {etag}")
    return {"bucket": bucket, "key": key, "etag": etag, "skipped": False}
