"""Baseline JPEG kernel (kernels/jpeg.py) — wire-format + fidelity.

The fixture corpus is seeded NOISE — the adversarial worst case for a
DCT codec (zero energy compaction) — so the PSNR floors here are the
hard ones; natural/smooth content does strictly better (asserted via
the gradient case, which must also compress far smaller).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from overmatch_spark.images import decode, encode, gen_pixels, psnr_db
from overmatch_spark.kernels.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    build_codes,
    jpeg_decode_rgb,
    jpeg_encode_rgb,
    scaled_qt,
    QT_LUMA,
    ZIGZAG,
    UNZIGZAG,
)


def _gradient(h: int, w: int) -> np.ndarray:
    g = np.zeros((h, w, 3), np.uint8)
    g[..., 0] = np.linspace(0, 255, w).astype(np.uint8)[None, :]
    g[..., 1] = np.linspace(0, 255, h).astype(np.uint8)[:, None]
    g[..., 2] = 128
    return g


class TestWireFormat:
    def test_markers_and_dims(self):
        px = gen_pixels("jpeg/wire", 24, 16)
        buf = jpeg_encode_rgb(px)
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in buf[:32]
        # SOF0 carries the TRUE (unpadded) dims
        i = buf.index(b"\xff\xc0")
        h, w = struct.unpack_from(">HH", buf, i + 5)
        assert (h, w) == (16, 24)

    def test_byte_deterministic(self):
        px = gen_pixels("jpeg/det", 32, 32)
        assert jpeg_encode_rgb(px) == jpeg_encode_rgb(px)

    def test_rejects_garbage_and_truncation(self):
        with pytest.raises(ValueError):
            jpeg_decode_rgb(b"\x00\x01\x02\x03")
        buf = jpeg_encode_rgb(gen_pixels("jpeg/trunc", 16, 16))
        with pytest.raises(ValueError):
            # chop before the scan: missing SOS/entropy data
            jpeg_decode_rgb(buf[: buf.index(b"\xff\xda")] + b"\xff\xd9")

    def test_zigzag_is_spec_sequence(self):
        # T.81 figure 5 first/last entries + involution property
        assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
        assert ZIGZAG[63] == 63
        flat = np.arange(64)
        assert np.array_equal(flat[ZIGZAG][UNZIGZAG], flat)

    def test_canonical_huffman_prefix_free(self):
        codes = build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        assert len(codes) == 162
        as_bits = {
            format(c, f"0{ln}b") for ln, c in codes.values()
        }
        assert len(as_bits) == 162
        for a in as_bits:
            for b in as_bits:
                if a is not b and b.startswith(a):
                    assert a == b, "prefix violation"

    def test_quality_scaling_monotone(self):
        q50 = scaled_qt(QT_LUMA, 50)
        q90 = scaled_qt(QT_LUMA, 90)
        assert np.array_equal(q50, QT_LUMA)  # IJG: Q=50 is the base table
        assert (q90 <= q50).all() and (q90 >= 1).all()


class TestFidelity:
    @pytest.mark.parametrize("w,h", [(16, 16), (64, 48), (33, 29), (8, 40)])
    def test_noise_roundtrip_psnr(self, w, h):
        px = gen_pixels(f"jpeg/{w}x{h}", w, h)
        dec = jpeg_decode_rgb(jpeg_encode_rgb(px, quality=98))
        assert dec.shape == (h, w, 3)
        assert psnr_db(px, dec) >= 40.0  # the sink invariant floor

    def test_smooth_beats_noise(self):
        noise = gen_pixels("jpeg/n", 56, 40)
        grad = _gradient(40, 56)
        nb = jpeg_encode_rgb(noise, quality=90)
        gb = jpeg_encode_rgb(grad, quality=90)
        # energy compaction: smooth content compresses far smaller...
        assert len(gb) < len(nb) / 4
        # ...and reconstructs at least as well
        assert psnr_db(grad, jpeg_decode_rgb(gb)) >= 40.0

    def test_flat_image_near_exact(self):
        px = np.full((24, 24, 3), 77, np.uint8)
        dec = jpeg_decode_rgb(jpeg_encode_rgb(px, quality=90))
        assert np.abs(px.astype(int) - dec.astype(int)).max() <= 1

    def test_420_subsampled_roundtrip(self):
        # 4:2:0 (the canonical real-world shape): Y 2x2, box chroma.
        # Exercises the general interleaved-MCU decoder (4 Y blocks +
        # Cb + Cr per 16x16 MCU) that the 4:4:4 path never hits.
        g = _gradient(40, 56)
        b420 = jpeg_encode_rgb(g, quality=90, subsample=True)
        d420 = jpeg_decode_rgb(b420)
        assert d420.shape == (40, 56, 3)
        assert psnr_db(g, d420) >= 38.0
        # SOF0 must carry Y sampling 0x22, chroma 0x11
        i = b420.index(b"\xff\xc0")
        assert b420[i + 11] == 0x22 and b420[i + 14] == 0x11
        # chroma halving must save bytes vs 4:4:4 at equal quality
        assert len(b420) < len(jpeg_encode_rgb(g, quality=90))

    def test_420_odd_dims_crop(self):
        # non-multiple-of-16 dims: MCU padding by edge replication,
        # decoder crops to the SOF0 true size
        g = np.ascontiguousarray(_gradient(40, 56)[:37, :51])
        d = jpeg_decode_rgb(jpeg_encode_rgb(g, quality=90, subsample=True))
        assert d.shape == (37, 51, 3)
        assert psnr_db(g, d) >= 38.0

    def test_images_codec_integration(self):
        # the fmt='jpeg' path through images.encode/decode (quality 98)
        px = gen_pixels("img/000000000003", 16, 16)
        buf = encode(px, "jpeg")
        dec = decode(buf, 16, 16, "jpeg")
        assert psnr_db(px, dec) >= 40.0
        with pytest.raises(ValueError):
            decode(buf, 8, 8, "jpeg")  # metadata mismatch must raise


class TestSparkPath:
    def test_invariant_report_jpeg_rows(self, spark):
        from overmatch_spark.fixtures import caption_for, make_images
        from overmatch_spark.images import invariant_report

        pdf = make_images(40, with_bytes=True)
        jp = pdf[pdf.fmt == "jpeg"]
        assert len(jp) == 8  # i%5 mix puts jpeg on every 5th row
        rep = (
            invariant_report(
                spark.createDataFrame(pdf).repartition(4),
                expected_caption_fn=caption_for,
            )
            .toPandas()
            .set_index("image_id")
        )
        assert rep.loc[jp.image_id, "pixels_ok"].all()
        assert (rep.loc[jp.image_id, "psnr_db"] >= 40.0).all()
