"""Content-based perceptual hash (kernels/phash.py + compute_phash).

Stability is asserted under every lossy path in the tree (jpeg 4:4:4,
jpeg 4:2:0, qlossy, brightness shift) and discrimination over both
structured and noise corpora; the Spark operator must equal the
single-node numpy replay row-for-row and feed the existing
hamming<=k pigeonhole retrieval.
"""

from __future__ import annotations

import numpy as np

from overmatch_spark.images import decode, encode, gen_pixels
from overmatch_spark.kernels.jpeg import jpeg_decode_rgb, jpeg_encode_rgb
from overmatch_spark.kernels.phash import hamming64, phash64


def _structured(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    rng = np.random.Generator(np.random.PCG64(seed))
    img = np.zeros((h, w, 3))
    for c in range(3):
        f1, f2, ph = rng.uniform(0.5, 4, 3)
        img[..., c] = (
            128
            + 90 * np.sin(2 * np.pi * (f1 * yy / h + f2 * xx / w) + ph)
            + rng.normal(0, 8, (h, w))
        )
    return np.clip(img, 0, 255).astype(np.uint8)


class TestKernel:
    def test_stable_under_reencode_structured(self):
        px = _structured(7)
        h0 = phash64(px)
        for variant in (
            jpeg_decode_rgb(jpeg_encode_rgb(px, 98)),
            jpeg_decode_rgb(jpeg_encode_rgb(px, 85)),
            jpeg_decode_rgb(jpeg_encode_rgb(px, 90, subsample=True)),
            decode(encode(px, "qlossy"), 64, 48, "qlossy"),
            np.clip(px.astype(int) + 12, 0, 255).astype(np.uint8),
        ):
            assert hamming64(h0, phash64(variant)) <= 3

    def test_stable_under_reencode_noise(self):
        # noise is the adversarial case (no dominant low-freq
        # structure) — still only a few bits move
        px = gen_pixels("ph/n", 64, 48)
        h0 = phash64(px)
        assert hamming64(h0, phash64(jpeg_decode_rgb(jpeg_encode_rgb(px, 98)))) <= 3
        assert hamming64(h0, phash64(decode(encode(px, "qlossy"), 64, 48, "qlossy"))) <= 6

    def test_discriminates_unrelated(self):
        hs = [phash64(_structured(s)) for s in range(15)]
        hn = [phash64(gen_pixels(f"ph/{i}", 64, 48)) for i in range(15)]
        for pool in (hs, hn):
            d = [
                hamming64(pool[i], pool[j])
                for i in range(len(pool))
                for j in range(i + 1, len(pool))
            ]
            assert min(d) >= 10  # far above any near-dup threshold
            assert 24 <= float(np.mean(d)) <= 40  # ~independent bits

    def test_deterministic_and_signed_int64(self):
        px = _structured(3)
        h = phash64(px)
        assert h == phash64(px.copy())
        assert -(1 << 63) <= h < (1 << 63)


class TestSparkOperator:
    def test_matches_numpy_replay_and_finds_reencodes(self, spark):
        import pandas as pd

        from overmatch_spark.operators.multimodal import (
            compute_phash,
            phash_near_dups,
        )

        # corpus: 12 originals + a jpeg re-encode of each (content
        # near-dup with a DIFFERENT byte payload and fmt)
        rows = []
        expected = {}
        for i in range(12):
            px = _structured(100 + i)
            rows.append((f"o/{i}", encode(px, "raw"), 64, 48, "raw"))
            rows.append(
                (f"v/{i}", jpeg_encode_rgb(px, 90), 64, 48, "jpeg")
            )
            expected[f"o/{i}"] = phash64(px)
        pdf = pd.DataFrame(
            rows, columns=["image_id", "bytes", "w", "h", "fmt"]
        )
        hashed = compute_phash(
            spark.createDataFrame(pdf).repartition(4)
        ).persist()
        got = {r.image_id: r.phash_dct for r in hashed.collect()}
        assert len(got) == 24
        for i in range(12):  # distributed == single-node replay
            assert got[f"o/{i}"] == expected[f"o/{i}"]

        pairs = phash_near_dups(
            hashed, phash_col="phash_dct", id_col="image_id", k=3
        ).toPandas()
        found = {
            tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)
        }
        # every original<->re-encode pair found, nothing else
        assert found == {
            tuple(sorted((f"o/{i}", f"v/{i}"))) for i in range(12)
        }

    def test_dedup_images_by_content(self, spark):
        import pandas as pd

        from overmatch_spark.operators.multimodal import (
            dedup_images_by_content,
        )

        # 8 distinct pictures, each present as raw + jpeg re-encode +
        # brightness-shifted raw (3 content-dups with distinct ids,
        # bytes, and fmt), plus 4 singletons
        rows = []
        for i in range(8):
            px = _structured(200 + i)
            br = np.clip(px.astype(int) + 10, 0, 255).astype(np.uint8)
            rows.append((f"a/{i}", encode(px, "raw"), 64, 48, "raw", 3))
            rows.append((f"b/{i}", jpeg_encode_rgb(px, 90), 64, 48, "jpeg", 1))
            rows.append((f"c/{i}", encode(br, "raw"), 64, 48, "raw", 9))
        for i in range(4):
            px = _structured(900 + i)
            rows.append((f"s/{i}", encode(px, "raw"), 64, 48, "raw", 5))
        pdf = pd.DataFrame(
            rows, columns=["image_id", "bytes", "w", "h", "fmt", "score"]
        )
        df = spark.createDataFrame(pdf).repartition(4)

        # min-id survivor: one a/i per cluster + all singletons
        kept = dedup_images_by_content(df, k=3).toPandas()
        assert sorted(kept.image_id) == sorted(
            [f"a/{i}" for i in range(8)] + [f"s/{i}" for i in range(4)]
        )
        assert set(kept.columns) == set(pdf.columns)  # rows intact

        # keep-best survivor: score 9 picks c/i per cluster instead
        # of the min-id a/i; singletons survive either way
        best = dedup_images_by_content(df, k=3, score_col="score").toPandas()
        assert sorted(best.image_id) == sorted(
            [f"c/{i}" for i in range(8)] + [f"s/{i}" for i in range(4)]
        )
