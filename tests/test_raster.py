"""Raster tile pyramid tests: stdlib PNG codec roundtrip, per-pixel
density equality vs an independent numpy rasterizer, raster/vector
tile-assignment alignment, and the tile_type=png archive."""

import math

import numpy as np
import pytest

from overmatch_spark.kernels.png import png_decode_gray, png_encode_gray


class TestPng:
    def test_roundtrip_identity(self):
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 256, size=(64, 48), dtype=np.uint8)
        assert np.array_equal(png_decode_gray(png_encode_gray(arr)), arr)

    def test_signature_and_determinism(self):
        arr = np.zeros((8, 8), dtype=np.uint8)
        b1, b2 = png_encode_gray(arr), png_encode_gray(arr)
        assert b1[:8] == b"\x89PNG\r\n\x1a\n"
        assert b1 == b2

    def test_rejects_non_uint8(self):
        with pytest.raises(ValueError):
            png_encode_gray(np.zeros((4, 4), dtype=np.int32))

    def test_rgb_roundtrip_and_image_codec_path(self):
        from overmatch_spark.images import decode, encode
        from overmatch_spark.kernels.png import (
            png_decode_rgb,
            png_encode_rgb,
        )

        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
        assert np.array_equal(png_decode_rgb(png_encode_rgb(px)), px)
        # the image pipeline's fmt="png" is the same real codec
        assert np.array_equal(decode(encode(px, "png"), 9, 12, "png"), px)


def _ref_raster(points, z, size=256, clamp=255):
    """Independent numpy rasterizer (driver-side oracle)."""
    n = 1 << z
    tiles = {}
    for lon, lat in points:
        fx = (lon + 180.0) / 360.0 * n
        rad = lat * math.pi / 180.0
        fy = (
            (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi)
            / 2.0
            * n
        )
        x = max(0, min(n - 1, int(math.floor(fx))))
        y = max(0, min(n - 1, int(math.floor(fy))))
        px = max(0, min(size - 1, int(math.floor((fx - x) * size))))
        py = max(0, min(size - 1, int(math.floor((fy - y) * size))))
        img = tiles.setdefault((z, x, y), np.zeros((size, size), np.int64))
        img[py, px] += 1
    return {
        k: np.minimum(v, clamp).astype(np.uint8) for k, v in tiles.items()
    }


@pytest.fixture(scope="module")
def points():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-71.2, -70.8, 500)
    lat = rng.uniform(41.1, 41.4, 500)
    # a dense hotspot so clamping and >1 pixel counts are exercised
    lon = np.concatenate([lon, np.full(300, -71.05)])
    lat = np.concatenate([lat, np.full(300, 41.25)])
    return list(zip(lon.tolist(), lat.tolist()))


class TestRasterTiles:
    def test_density_matches_numpy_oracle(self, spark, points):
        from overmatch_spark.operators.raster import raster_tiles

        df = spark.createDataFrame(points, "lon double, lat double")
        got = {
            (r["z"], r["x"], r["y"]): png_decode_gray(bytes(r["data"]))
            for r in raster_tiles(df, zooms=(8, 10)).collect()
        }
        want = {**_ref_raster(points, 8), **_ref_raster(points, 10)}
        assert set(got) == set(want)
        for k in want:
            assert np.array_equal(got[k], want[k]), f"tile {k}"

    def test_aligns_with_vector_assignment(self, spark, points):
        """Every occupied raster tile must be exactly the tile set the
        vector path assigns (same formula text -> same tiles)."""
        from pyspark.sql import functions as F

        from overmatch_spark import expressions as X
        from overmatch_spark.operators.raster import raster_tiles

        df = spark.createDataFrame(points, "lon double, lat double")
        z = 10
        raster_keys = {
            (r["x"], r["y"])
            for r in raster_tiles(df, zooms=(z,)).select("x", "y").collect()
        }
        vector_keys = {
            (r["x"], r["y"])
            for r in df.select(
                X.tile_x(F.col("lon"), z).alias("x"),
                X.tile_y(F.col("lat"), z).alias("y"),
            )
            .distinct()
            .collect()
        }
        assert raster_keys == vector_keys

    def test_png_archive_roundtrip(self, spark, points, tmp_path):
        from overmatch_spark.operators.pmtiles import PMTilesReader
        from overmatch_spark.operators.raster import write_raster_pmtiles

        df = spark.createDataFrame(points, "lon double, lat double")
        path = str(tmp_path / "density.pmtiles")
        summary = write_raster_pmtiles(df, path, zooms=(8, 10))
        rd = PMTilesReader(path)
        assert rd.tile_type == 2  # png
        assert rd.tile_compression == 1  # none (png self-compressed)
        assert rd.n_entries == summary["tiles"]
        assert rd.metadata["format"] == "png"
        want = {**_ref_raster(points, 8), **_ref_raster(points, 10)}
        for (z, x, y), img in want.items():
            blob = rd.get_tile(z, x, y)
            assert isinstance(blob, (bytes, bytearray))
            assert np.array_equal(png_decode_gray(bytes(blob)), img)
