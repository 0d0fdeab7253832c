"""End-to-end pipeline over the image+caption table (north_star):
images -> derived layers -> checkpointed conflation -> payload
re-attachment by id -> per-row decoded-pixel PSNR + caption equality
at the sink. The payload bytes never enter the match-path shuffles
(narrow projections only); they are re-attached at the end."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from overmatch_spark import fixtures
from overmatch_spark.spec import conflate_spec

N = 400


def test_mapinpandas_derivation_is_batch_invariant(spark):
    """The layer derivation must depend ONLY on per-row values, never
    on Arrow batch boundaries: deriving through mapInPandas over an
    arbitrary partitioning must equal the single-frame driver-side
    derivation row-for-row (regression for the positional hot-cell
    index bug)."""
    images_pdf = fixtures.make_images(300, with_bytes=False)
    images = spark.createDataFrame(images_pdf).repartition(7)

    def der_a(batches):
        for pdf in batches:
            yield fixtures.derive_layer_a(pdf)

    got = (
        images.mapInPandas(
            der_a,
            "osm_id string, name string, housenumber string, lon double, "
            "lat double, image_id string",
        )
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    want = (
        fixtures.derive_layer_a(images_pdf)
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert got["osm_id"].tolist() == want["osm_id"].tolist()
    assert np.array_equal(got["lon"].to_numpy(), want["lon"].to_numpy())
    assert np.array_equal(got["lat"].to_numpy(), want["lat"].to_numpy())


def test_images_to_matches_with_payload_invariants(spark, tmp_path):
    from overmatch_spark.images import decode, gen_pixels, psnr_db
    from overmatch_spark.operators.checkpoint import ConflationJob
    from overmatch_spark.operators.conflate import attach_payload

    images_pdf = fixtures.make_images(N, with_bytes=True)
    a_pdf = fixtures.derive_layer_a(images_pdf)
    b_pdf = fixtures.source_filter_b(fixtures.derive_layer_b(images_pdf))

    images = spark.createDataFrame(images_pdf)
    layer_a = spark.createDataFrame(a_pdf)  # includes image_id
    layer_b = spark.createDataFrame(b_pdf[["id", "name", "housenumber",
                                           "lon", "lat", "image_id"]])

    # checkpointed, resumable conflation (narrow columns only)
    job = ConflationJob(spark, str(tmp_path / "job"), n_buckets=4)
    job.prepare(layer_a, layer_b)
    job.run()
    matches = job.result()

    golden = conflate_spec(a_pdf, b_pdf)
    assert matches.count() == len(golden) > 0

    # re-attach the image payload by id AFTER the match path
    b_ids = layer_b.select(F.col("id").alias("overture_id"),
                           F.col("image_id"))
    with_img = matches.join(b_ids, "overture_id")
    final = attach_payload(
        with_img,
        images.select(
            F.col("image_id").alias("p_image_id"), "bytes", "w", "h", "fmt",
            "caption",
        ),
        "image_id",
        "p_image_id",
    )

    out = final.select("overture_id", "image_id", "bytes", "w", "h", "fmt",
                       "caption").toPandas()
    assert out["bytes"].notna().all()

    # per-row sink invariants: decoded pixels vs regenerated original
    for row in out.itertuples(index=False):
        orig = gen_pixels(row.image_id, row.w, row.h)
        dec = decode(bytes(row.bytes), row.w, row.h, row.fmt)
        if row.fmt == "raw":
            assert np.array_equal(orig, dec)
        else:
            assert psnr_db(orig, dec) >= 40.0
        assert row.caption == fixtures.caption_for(row.image_id)
