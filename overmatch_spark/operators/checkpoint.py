"""Checkpointed, resumable conflation job (SURVEY.md §7.2.8; north
rule: "checkpoint per-partition progress with lineage + metrics so any
run resumes mid-job without recomputing completed cells").

Reference precedent: the KV loader's skip-existing resume + batch
retry (/root/reference/api/load_matches.py:105-142,176-264). Here the
unit of work is a SPATIAL BUCKET: a hash of the coarse cell id, so
bucket boundaries respect the cell-join locality:

  - layer_b rows live in exactly one bucket (their cell's bucket).
  - layer_a probe rows are exploded to their cover cells first; each
    (probe, cover-cell) pair goes to that cell's bucket. A pair
    (a, b) is therefore evaluated in exactly one bucket — the bucket
    of b's cell — and the union over buckets equals the single-shot
    join exactly (property-tested, including kill/resume equality).

Exactly-once sink without Iceberg: each bucket writes to its own
directory (`matches/bucket=K/`) with mode=overwrite, and its lineage
row (`lineage/bucket=K/`) is committed only AFTER the data write; a
crash between the two reruns the bucket idempotently. With Iceberg
available, the same protocol is `overwrite-by-filter` + a lineage
table MERGE.

At 100 TB: stage 0 is one full shuffle (the partitionBy write) that
would already exist as the conflation's own shuffle; stage 1's
per-bucket jobs read back only `bucket=K` via partition pruning, so a
resume touches no completed bucket's bytes.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from overmatch_spark import expressions as X
from overmatch_spark.udfs import indel_sim


class ConflationJob:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        n_buckets: int = 32,
        res: int = 18,
        buffer_m: float = 100.0,
        sim_threshold: float = 0.6,
    ):
        self.spark = spark
        self.work_dir = work_dir
        self.n_buckets = n_buckets
        self.res = res
        self.buffer_m = buffer_m
        self.sim_threshold = sim_threshold
        self.stage_dir = os.path.join(work_dir, "stage")
        self.sink_dir = os.path.join(work_dir, "matches")
        self.lineage_dir = os.path.join(work_dir, "lineage")

    # -- stage 0: bucketed materialization ---------------------------------
    def prepare(self, layer_a: DataFrame, layer_b: DataFrame) -> None:
        bucket_of = lambda cell: F.pmod(F.xxhash64(cell), F.lit(self.n_buckets))

        a = (
            layer_a.filter(F.col("name").isNotNull() & (F.col("name") != ""))
            .select(
                "osm_id",
                F.col("name").alias("a_name"),
                F.col("housenumber").alias("a_housenumber"),
                X.merc_x(F.col("lon")).alias("ax"),
                X.merc_y(F.col("lat")).alias("ay"),
            )
            .withColumn(
                "cell",
                F.explode(
                    X.cover_cells(F.col("ax"), F.col("ay"), self.res, self.buffer_m)
                ),
            )
            .withColumn("bucket", bucket_of(F.col("cell")))
        )
        b = (
            layer_b.select(
                F.col("id").alias("overture_id"),
                F.col("name").alias("b_name"),
                F.col("housenumber").alias("b_housenumber"),
                F.col("lon").alias("b_lon"),
                F.col("lat").alias("b_lat"),
                X.merc_x(F.col("lon")).alias("bx"),
                X.merc_y(F.col("lat")).alias("by"),
            )
            .withColumn("cell", X.cell_of(F.col("bx"), F.col("by"), self.res))
            .withColumn("bucket", bucket_of(F.col("cell")))
        )
        a.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(self.stage_dir, "a")
        )
        b.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(self.stage_dir, "b")
        )

    # -- lineage ------------------------------------------------------------
    def completed_buckets(self) -> set[int]:
        done = set()
        if not os.path.isdir(self.lineage_dir):
            return done
        for name in os.listdir(self.lineage_dir):
            if name.startswith("bucket="):
                marker = os.path.join(self.lineage_dir, name, "_DONE.json")
                if os.path.exists(marker):
                    done.add(int(name.split("=")[1]))
        return done

    def _commit_lineage(self, bucket: int, metrics: dict) -> None:
        d = os.path.join(self.lineage_dir, f"bucket={bucket}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "_DONE.json.tmp")
        with open(tmp, "w") as f:
            json.dump(metrics, f)
        os.replace(tmp, os.path.join(d, "_DONE.json"))  # atomic commit

    def lineage(self) -> list[dict]:
        out = []
        for k in sorted(self.completed_buckets()):
            with open(
                os.path.join(self.lineage_dir, f"bucket={k}", "_DONE.json")
            ) as f:
                out.append(json.load(f))
        return out

    # -- stage 1: per-bucket conflation with resume --------------------------
    def run(self, max_buckets: int | None = None) -> int:
        """Process pending buckets (optionally capped, for fault
        injection in tests). Returns the number processed."""
        pending = [
            k for k in range(self.n_buckets) if k not in self.completed_buckets()
        ]
        if max_buckets is not None:
            pending = pending[:max_buckets]
        a_path = os.path.join(self.stage_dir, "a")
        b_path = os.path.join(self.stage_dir, "b")
        for k in pending:
            t0 = time.time()
            # partition-pruned scans: only bucket=k bytes are read
            a = self.spark.read.parquet(a_path).filter(F.col("bucket") == k)
            b = self.spark.read.parquet(b_path).filter(F.col("bucket") == k)
            cand = a.join(b, "cell").withColumn(
                "dist",
                X.planar_distance(
                    F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")
                ),
            ).filter(F.col("dist") <= F.lit(self.buffer_m))
            out = (
                cand.filter(F.col("b_name").isNotNull() & (F.col("b_name") != ""))
                .withColumn(
                    "similarity", indel_sim(F.col("a_name"), F.col("b_name"))
                )
                .filter(F.col("similarity") >= F.lit(self.sim_threshold))
                .filter(
                    F.col("a_housenumber").isNull()
                    | F.col("b_housenumber").isNull()
                    | (F.col("a_housenumber") == F.col("b_housenumber"))
                )
                .select(
                    "osm_id",
                    "overture_id",
                    F.col("b_lon").alias("lon"),
                    F.col("b_lat").alias("lat"),
                    X.round1(F.col("dist")).alias("distance_m"),
                    "similarity",
                )
            )
            sink = os.path.join(self.sink_dir, f"bucket={k}")
            out.write.mode("overwrite").parquet(sink)  # idempotent per bucket
            n = self.spark.read.parquet(sink).count()
            self._commit_lineage(
                k,
                {
                    "bucket": k,
                    "n_matches": n,
                    "wall_ms": int((time.time() - t0) * 1000),
                    "res": self.res,
                    "buffer_m": self.buffer_m,
                },
            )
        return len(pending)

    def result(self) -> DataFrame:
        return self.spark.read.parquet(self.sink_dir)
