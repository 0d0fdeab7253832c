"""Scratch profiler: minhash_lsh_pairs per-stage wall time at sf0.1
(same derived input as bench.py's minhash row). Not part of the
driver contract.

Stages isolated (each via noop/count, guide §1.4):
  base    — shingles + per-shingle md5 token hashes (persisted)
  sig     — 16 permutation mins over cached th arrays
  cand    — banded self-join + pair dedup (from cached base)
  full    — whole operator with cached base (warm)
  cold    — whole operator, nothing cached
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F
from window_probe import alu_ops

from overmatch_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signature_from_hashes,
    minhash_token_hashes,
    shingles,
)
from overmatch_spark.session import get_spark


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "minhash-profile", cpus=cpus,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs_dup = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    ).persist()
    n = docs_dup.count()
    print(f"docs: {n}", flush=True)
    # warm-up the worker pool / JIT with one throwaway cold run
    caches: list = []
    t0 = time.time()
    run_noop(minhash_lsh_pairs(docs_dup, "text", "doc_id", caches=caches))
    print(f"warmup cold run: {time.time()-t0:.2f}s", flush=True)
    for df in caches:
        df.unpersist()

    print(f"alu: {alu_ops():.2f}", flush=True)

    # ---- stage breakdown ----
    base = docs_dup.select(
        F.col("doc_id"), shingles(F.col("text"), 3).alias("sh")
    ).withColumn("th", minhash_token_hashes(F.col("sh"))).persist()
    t0 = time.time()
    base.count()
    print(f"stage base (shingles+md5): {time.time()-t0:.2f}s", flush=True)

    sig = base.withColumn(
        "sig", minhash_signature_from_hashes(F.col("th"), 16)
    ).select("doc_id", "sig")
    t0 = time.time()
    run_noop(sig)
    print(f"stage sig (16 perms, from cached th): {time.time()-t0:.2f}s",
          flush=True)

    # candidate generation only: run the operator but count pairs
    # before verification by rebuilding the banded/join section inline
    bands, rows_per_band = 8, 2
    sigd = base.withColumn(
        "sig", minhash_signature_from_hashes(F.col("th"), 16)
    )
    banded = sigd.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bb).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[bb * rows_per_band + r].cast(
                                    "string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for bb in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    left = banded.select("band", "key", F.col("doc_id").alias("id_a"))
    right = banded.select("band", "key", F.col("doc_id").alias("id_b"))
    cand_ids = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    t0 = time.time()
    nc = cand_ids.count()
    print(f"stage cand (band self-join + dedup): {time.time()-t0:.2f}s "
          f"pairs={nc}", flush=True)

    # full pipeline with cached base (warm twin)
    ext: list = []
    t0 = time.time()
    run_noop(minhash_lsh_pairs(docs_dup, "text", "doc_id", caches=ext))
    print(f"full warm-base cold-everything-else: {time.time()-t0:.2f}s",
          flush=True)
    t0 = time.time()
    run_noop(minhash_lsh_pairs(docs_dup, "text", "doc_id", caches=ext))
    print(f"full warm rerun: {time.time()-t0:.2f}s", flush=True)
    for df in ext:
        df.unpersist()
    base.unpersist()

    # pure cold, min of 2
    for i in range(2):
        caches = []
        t0 = time.time()
        run_noop(minhash_lsh_pairs(docs_dup, "text", "doc_id", caches=caches))
        print(f"cold run{i}: {time.time()-t0:.2f}s", flush=True)
        for df in caches:
            df.unpersist()
    print(f"alu: {alu_ops():.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
