"""spark-submit entry point for the full conflation pipeline
(north_rule: "runs end-to-end via spark-submit --py-files on a
multi-executor cluster").

    spark-submit --py-files overmatch_spark.zip scripts/run_pipeline.py \
        --images <parquet> --work-dir <dir> [--n-buckets 32] [--resume]

In the sandbox (no cluster manager) the same script runs under
local[*]; on a cluster only --master changes. The job is the
checkpointed bucket pipeline (operators/checkpoint.py), so a re-run
with --resume continues mid-job without recomputing completed cells.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_session():
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName("overmatch-pipeline").getOrCreate()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True, help="images parquet path")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--resume", action="store_true",
                   help="skip stage-0 prepare and continue from lineage")
    p.add_argument("--pmtiles", default=None, metavar="PATH",
                   help="also assemble the PMTiles v3 serving archive "
                        "(the reference's tippecanoe step, "
                        "build_pmtiles.py:186-198, done natively)")
    p.add_argument("--raster-pmtiles", default=None, metavar="PATH",
                   help="also assemble the density-raster PMTiles "
                        "(tile_type=png, stdlib PNG codec)")
    p.add_argument("--publish", default=None, metavar="BUCKET[:KEY]",
                   help="publish the --pmtiles archive (K6 headers, "
                        "etag-idempotent). Uses S3 when boto3 is "
                        "available, else set --publish-root for the "
                        "filesystem store")
    p.add_argument("--publish-root", default=None, metavar="DIR",
                   help="filesystem object-store root for --publish")
    args = p.parse_args(argv)

    # fail argument combos NOW, not after a multi-hour pipeline run
    if args.publish:
        if not args.pmtiles:
            p.error("--publish requires --pmtiles")
        if not args.publish_root:
            try:
                import boto3  # noqa: F401
            except ImportError:
                p.error(
                    "--publish needs boto3 (S3) or --publish-root "
                    "(filesystem store)"
                )

    from pyspark.sql import functions as F

    from overmatch_spark.operators.checkpoint import ConflationJob

    spark = build_session()
    t0 = time.time()

    # Derive the two feature layers from the image table (FIXTURES.md
    # §2 — lon/lat from phash bits, name := caption, id := image_id).
    images = spark.read.parquet(args.images)
    job = ConflationJob(spark, args.work_dir, n_buckets=args.n_buckets)

    if not args.resume:
        import pandas as pd

        from overmatch_spark import fixtures

        # layers are derived deterministically; at real scale this is
        # a pure-Spark projection — here we reuse the fixture
        # derivation via mapInPandas for exact spec parity
        def der_a(batches):
            for pdf in batches:
                yield fixtures.derive_layer_a(pdf)

        def der_b(batches):
            for pdf in batches:
                yield fixtures.source_filter_b(fixtures.derive_layer_b(pdf))

        a = images.mapInPandas(
            der_a,
            "osm_id string, name string, housenumber string, lon double, "
            "lat double, image_id string",
        )
        b = images.mapInPandas(
            der_b,
            "id string, name string, housenumber string, lon double, "
            "lat double, confidence double, category string, "
            "operating_status string, image_id string",
        )
        job.prepare(a, b)

    done = job.run()
    n = job.result().count()
    print(
        f"pipeline done: {done} buckets processed, {n} matches, "
        f"{time.time() - t0:.1f}s; lineage rows: {len(job.lineage())}"
    )

    if args.pmtiles:
        from overmatch_spark.operators.pmtiles import matches_to_pmtiles

        summary = matches_to_pmtiles(
            job.result(), args.pmtiles, num_partitions=args.n_buckets
        )
        print(f"pmtiles: {summary}")

    if args.raster_pmtiles:
        from overmatch_spark.operators.raster import write_raster_pmtiles

        summary = write_raster_pmtiles(
            job.result().select("lon", "lat"), args.raster_pmtiles
        )
        print(f"raster pmtiles: {summary}")

    if args.publish:
        from overmatch_spark.operators.publish import (
            LocalObjectStore,
            publish_pmtiles,
        )

        bucket, _, key = args.publish.partition(":")
        store = (
            LocalObjectStore(args.publish_root) if args.publish_root else None
        )
        r = publish_pmtiles(args.pmtiles, bucket, key or None, store=store)
        print(f"published: {r}")


if __name__ == "__main__":
    sys.exit(main())
