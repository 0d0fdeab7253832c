"""Image payload codec + per-row invariants (BASELINE.json input_hint).

The input table carries image payloads as opaque ``binary``:
  images(image_id string, bytes binary, w int, h int, fmt string,
         caption string, phash int64)

No image libraries exist in this sandbox (no Pillow), so the codecs
are implemented here (FIXTURES.md §1):
  - ``raw``     row-major h*w*3 uint8, exact.
  - ``qlossy``  uniform quantization with step q=4 (values (p//4)*4+2,
                max abs error 2 -> PSNR >= 20*log10(255/2) ~ 42.1 dB).
  - ``png``     REAL lossless PNG (stdlib zlib DEFLATE) — kernels/png.py.
  - ``jpeg``    REAL baseline JFIF (8x8 DCT + Annex-K quant/Huffman,
                pure numpy) — kernels/jpeg.py. Encoded at quality 98
                so even the seeded-noise fixtures (the DCT worst
                case) clear the 40 dB sink invariant.

Only webp remains stubbed (no spec-simple pure-numpy path: VP8 intra
prediction + boolean arithmetic coding). The Spark-side plumbing
(binary column, Arrow batches via mapInPandas, payload kept out of
shuffles) is identical for all formats.

Per-row invariant at every sink (north rule): decoded pixels allclose
vs the original (PSNR >= 40 dB for lossy) AND caption equality.
"""

from __future__ import annotations

import numpy as np

QLOSSY_STEP = 4


def fnv64(s: str) -> int:
    """64-bit FNV-1a of a string -> signed int64 (the `phash`)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 64) if h >= (1 << 63) else h


def gen_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixels for an id (seeded PCG64)."""
    seed = fnv64(image_id) & 0xFFFFFFFFFFFFFFFF
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "qlossy":
        q = QLOSSY_STEP
        return ((pixels // q) * q + q // 2).astype(np.uint8).tobytes()
    if fmt == "png":
        # REAL lossless codec, not a stub: PNG's only compression is
        # DEFLATE (stdlib zlib) — see kernels/png.py
        from overmatch_spark.kernels.png import png_encode_rgb

        return png_encode_rgb(pixels)
    if fmt == "jpeg":
        # REAL DCT codec, not a stub: baseline JFIF (Annex-K tables,
        # 8x8 DCT, canonical Huffman) in pure numpy — kernels/jpeg.py.
        # Quality 98 because the fixture corpus is seeded noise (the
        # DCT worst case) and the sink invariant is PSNR >= 40 dB.
        from overmatch_spark.kernels.jpeg import jpeg_encode_rgb

        return jpeg_encode_rgb(pixels, quality=98)
    raise NotImplementedError(
        f"fmt={fmt!r}: webp stays stubbed in this sandbox; 'raw', "
        "'qlossy', real 'png' and real baseline 'jpeg' are implemented"
    )


def decode(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt in ("raw", "qlossy"):
        return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "png":
        from overmatch_spark.kernels.png import png_decode_rgb

        px = png_decode_rgb(buf)
        if px.shape != (h, w, 3):
            raise ValueError(f"png dims {px.shape} != metadata ({h},{w},3)")
        return px
    if fmt == "jpeg":
        from overmatch_spark.kernels.jpeg import jpeg_decode_rgb

        px = jpeg_decode_rgb(buf)
        if px.shape != (h, w, 3):
            raise ValueError(f"jpeg dims {px.shape} != metadata ({h},{w},3)")
        return px
    raise NotImplementedError(f"fmt={fmt!r} not decodable in sandbox")


# ---------------------------------------------------------------------------
# Fake media containers (no codec libs in sandbox; the container
# parsing/seek math below is real demuxer logic — a real decoder slots
# into the frame/sample decode line only)
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"RAWV"  # header: magic + <IIII w h n_frames fps>, raw RGB frames
AUDIO_MAGIC = b"RAWA"  # header: magic + <II sample_rate n_samples>, int16 PCM
_V_HEAD = 4 + 16
_A_HEAD = 4 + 8


def encode_video(frames: list[np.ndarray], fps: int = 30) -> bytes:
    import struct

    h, w, _ = frames[0].shape
    head = VIDEO_MAGIC + struct.pack("<IIII", w, h, len(frames), fps)
    return head + b"".join(np.ascontiguousarray(f).tobytes() for f in frames)


def video_header(buf: bytes):
    """(w, h, n_frames, fps). Raises NotImplementedError for real
    containers (mp4/webm) — no codecs in this sandbox."""
    import struct

    if bytes(buf[:4]) != VIDEO_MAGIC:
        raise NotImplementedError(
            "real video containers (mp4/webm) need a codec library not "
            "present in this sandbox; only the RAWV fake container decodes"
        )
    return struct.unpack_from("<IIII", buf, 4)


def video_frame_bytes(buf: bytes, idx: int) -> bytes:
    """Seek to frame idx WITHOUT touching other frames (the constant-
    time offset math a real demuxer index provides)."""
    w, h, n, _fps = video_header(buf)
    if not 0 <= idx < n:
        raise IndexError(idx)
    fsz = w * h * 3
    start = _V_HEAD + idx * fsz
    return bytes(buf[start:start + fsz])


def encode_audio(samples: np.ndarray, rate: int = 16_000) -> bytes:
    import struct

    s = np.asarray(samples, dtype=np.int16)
    return AUDIO_MAGIC + struct.pack("<II", rate, s.size) + s.tobytes()


def decode_audio(buf: bytes):
    """(sample_rate, int16 samples). NotImplementedError for real
    codecs (mp3/opus)."""
    import struct

    if bytes(buf[:4]) != AUDIO_MAGIC:
        raise NotImplementedError(
            "real audio codecs (mp3/opus) are not present in this "
            "sandbox; only the RAWA fake container decodes"
        )
    rate, n = struct.unpack_from("<II", buf, 4)
    return rate, np.frombuffer(buf, dtype=np.int16, count=n, offset=_A_HEAD)


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio; inf when identical."""
    err = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(err * err))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def check_invariants_pdf(pdf, expected_caption_fn=None):
    """Pandas-batch invariant check used inside mapInPandas: for each
    row, decode `bytes` and compare against the regenerated original
    pixels; check caption. Returns a DataFrame(image_id, psnr_db,
    pixels_ok, caption_ok)."""
    import pandas as pd

    out = {"image_id": [], "psnr_db": [], "pixels_ok": [], "caption_ok": []}
    for row in pdf.itertuples(index=False):
        orig = gen_pixels(row.image_id, row.w, row.h)
        dec = decode(row.bytes, row.w, row.h, row.fmt)
        p = psnr_db(orig, dec)
        ok = bool(np.array_equal(orig, dec)) if row.fmt == "raw" else p >= 40.0
        cap_ok = (
            True
            if expected_caption_fn is None
            else row.caption == expected_caption_fn(row.image_id)
        )
        out["image_id"].append(row.image_id)
        out["psnr_db"].append(float(min(p, 1e9)))
        out["pixels_ok"].append(ok)
        out["caption_ok"].append(bool(cap_ok))
    return pd.DataFrame(out)


def invariant_report(df, expected_caption_fn=None):
    """Spark operator: images DataFrame -> per-row invariant report via
    mapInPandas (Arrow-batched; the decode is the one place bytes are
    materialized, and it happens scan-side with no shuffle)."""
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("psnr_db", DoubleType()),
            StructField("pixels_ok", BooleanType()),
            StructField("caption_ok", BooleanType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            yield check_invariants_pdf(pdf, expected_caption_fn)

    return df.select("image_id", "bytes", "w", "h", "fmt", "caption").mapInPandas(
        gen, schema
    )
