"""Partitioned, atomically-committed seen-state store (K5/D2 at scale).

The reference's store is DynamoDB: an upsert touches ONLY the items in
the batch (/root/reference/api/db.py:54-91). The round-1 fallback
rewrote the whole parquet store per merge — O(store x batches). This
store matches the reference's cost model:

  - rows are hash-bucketed by ``pmod(xxhash64(element_id), n_buckets)``;
  - a merge rewrites ONLY the buckets the batch touches (an
    overwrite-by-filter emulation of Iceberg's MERGE INTO);
  - commits are atomic: new bucket versions are written to fresh
    directories, then a single manifest JSON is swapped in via
    ``os.replace`` (the POSIX-atomic rename) — a crash mid-merge
    leaves the previous manifest pointing at the previous data, so no
    history is ever lost (unlike an in-place overwrite);
  - untouched buckets' files are BYTE-IDENTICAL across merges
    (pytest-verified), which is what makes incremental replication /
    caching of the store possible at 100 TB.

Re-applying the same batch is idempotent (min/max upsert), so a
streaming replay after a crash between manifest-commit and
checkpoint-commit converges to the same state.

Concurrency: the store is SINGLE-WRITER. merge_batch/compact take an
O_CREAT|O_EXCL lock file for the whole read-modify-write (two
concurrent writers would otherwise both read version N and the later
os.replace would silently discard the earlier writer's buckets), and
raise ConcurrentWriterError if another writer holds it. A writer that
died leaves a stale lock; break_lock() clears it explicitly — the
lock records its owner pid to make that call auditable. Readers never
take the lock (they see the last committed manifest).

Maintenance: every merge creates one new version directory holding
only the touched buckets, so a long-lived store accretes one live
directory per distinct touch-generation. compact() rewrites ALL
buckets at a single new version and GCs the rest, bounding the store
at n_buckets files in one directory; reads are byte-equal before and
after (pytest-verified).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from overmatch_spark.operators.seen import upsert_seen

_SCHEMA = "element_id string, first_seen long, last_seen long"
MANIFEST = "_MANIFEST.json"
LOCKFILE = "_WRITER.lock"


class ConcurrentWriterError(RuntimeError):
    """Another writer holds the store's merge lock."""


def bucket_of(element_id, n_buckets: int):
    return F.pmod(F.xxhash64(element_id), F.lit(n_buckets)).cast("int")


class PartitionedSeenStore:
    def __init__(self, spark: SparkSession, store_dir: str,
                 n_buckets: int = 32):
        self.spark = spark
        self.store_dir = store_dir
        self.n_buckets = n_buckets
        os.makedirs(store_dir, exist_ok=True)
        # the committed manifest owns the bucket count: reopening an
        # existing store with a different n_buckets would hash rows
        # into different buckets than they were committed to and
        # silently duplicate state — adopt the store's value instead
        committed = self.manifest()
        if committed["buckets"]:
            self.n_buckets = committed.get("n_buckets", n_buckets)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.store_dir, MANIFEST)

    def manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"version": 0, "n_buckets": self.n_buckets, "buckets": {}}
        with open(p) as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path())  # the atomic commit point

    # -- reads -------------------------------------------------------------
    def _bucket_paths(self, manifest: dict, buckets=None) -> list[str]:
        items = manifest["buckets"].items()
        if buckets is not None:
            want = {str(b) for b in buckets}
            items = [(b, v) for b, v in items if b in want]
        return [os.path.join(self.store_dir, rel) for _, rel in items]

    def read(self, buckets=None) -> DataFrame:
        """The current committed state (optionally only some buckets)."""
        paths = self._bucket_paths(self.manifest(), buckets)
        if not paths:
            return self.spark.createDataFrame([], _SCHEMA)
        return self.spark.read.schema(_SCHEMA).parquet(*paths)

    # -- writer lock -------------------------------------------------------
    def _lock_path(self) -> str:
        return os.path.join(self.store_dir, LOCKFILE)

    def _acquire_lock(self) -> None:
        try:
            fd = os.open(self._lock_path(), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                owner = open(self._lock_path()).read().strip()
            except OSError:
                owner = "?"
            raise ConcurrentWriterError(
                f"store {self.store_dir} is locked by writer pid={owner}; "
                "the store is single-writer (see module docstring); if "
                "that writer is dead, call break_lock()"
            ) from None
        with os.fdopen(fd, "w") as f:
            f.write(str(os.getpid()))

    def _release_lock(self) -> None:
        try:
            os.remove(self._lock_path())
        except FileNotFoundError:
            pass

    def break_lock(self) -> None:
        """Remove a stale writer lock left by a dead writer. Only call
        after confirming the owning process is gone."""
        self._release_lock()

    # -- merge -------------------------------------------------------------
    def merge_batch(self, batch: DataFrame) -> list[int]:
        """MERGE a batch(element_id, seen_at) into the store, rewriting
        only the touched buckets. Returns the touched bucket ids.
        Raises ConcurrentWriterError if another writer holds the lock."""
        b = batch.select("element_id", "seen_at").withColumn(
            "bucket", bucket_of(F.col("element_id"), self.n_buckets)
        ).persist()
        try:
            touched = sorted(
                r["bucket"] for r in b.select("bucket").distinct().collect()
            )
            if not touched:
                return []

            self._acquire_lock()
            try:
                manifest = self.manifest()
                version = manifest["version"] + 1
                vdir = f"v{version:06d}"
                out_path = os.path.join(self.store_dir, vdir)

                existing = self.read(buckets=touched)
                merged = upsert_seen(existing, b.drop("bucket")).withColumn(
                    "bucket", bucket_of(F.col("element_id"), self.n_buckets)
                )
                # one writer task per touched bucket: the store stays
                # bucket-partitioned on disk without a bucket=... dir scan
                merged.repartition(len(touched), "bucket").write.partitionBy(
                    "bucket"
                ).mode("overwrite").parquet(out_path)

                for t in touched:
                    manifest["buckets"][str(t)] = os.path.join(
                        vdir, f"bucket={t}"
                    )
                manifest["version"] = version
                manifest["n_buckets"] = self.n_buckets
                self._commit(manifest)
                self._gc(manifest)
            finally:
                self._release_lock()
            return touched
        finally:
            # every exit path (incl. ConcurrentWriterError and a failed
            # bucket write/commit) releases the cached batch
            b.unpersist()

    def compact(self) -> int:
        """Rewrite EVERY live bucket at one new version and GC the
        rest, so a long-lived store stops fragmenting into one
        directory per touch-generation. State is unchanged (reads are
        byte-equal pre/post); returns the new version. No-op on an
        empty store."""
        self._acquire_lock()
        try:
            manifest = self.manifest()
            if not manifest["buckets"]:
                return manifest["version"]
            version = manifest["version"] + 1
            vdir = f"v{version:06d}"
            out_path = os.path.join(self.store_dir, vdir)
            everything = self.read().withColumn(
                "bucket", bucket_of(F.col("element_id"), self.n_buckets)
            )
            everything.repartition(self.n_buckets, "bucket").write.partitionBy(
                "bucket"
            ).mode("overwrite").parquet(out_path)
            live = sorted(int(k) for k in manifest["buckets"])
            manifest["buckets"] = {
                str(t): os.path.join(vdir, f"bucket={t}") for t in live
            }
            manifest["version"] = version
            self._commit(manifest)
            self._gc(manifest)
        finally:
            self._release_lock()
        return version

    # -- maintenance ---------------------------------------------------------
    def _gc(self, manifest: dict) -> None:
        """Drop version directories no committed bucket points into.
        Runs AFTER commit, so a crash here at worst leaks a directory."""
        live = {rel.split(os.sep)[0] for rel in manifest["buckets"].values()}
        for entry in os.listdir(self.store_dir):
            if entry.startswith("v") and entry not in live:
                full = os.path.join(self.store_dir, entry)
                if os.path.isdir(full):
                    shutil.rmtree(full, ignore_errors=True)
