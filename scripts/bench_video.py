"""Video frame-sampling receipt: distributed MP4 demux at corpus scale.

Builds a corpus of REAL ISO-BMFF Motion-JPEG videos (kernels/mp4.py
mux + kernels/jpeg.py encode, distributed via mapInPandas), then
times `multimodal.sample_frames` over it: every video's sample table
is parsed once, only the SAMPLED frames are sliced and decoded — the
frames in between are never touched. Reports frames stored vs frames
decoded, videos/s and decoded frames/s, and verifies the PSNR >= 40
invariant on the sampled output. Prints one JSON line.

The scale story this receipt evidences: at 10^12-row corpora, frame
SELECTION must cost O(sample-table metadata), not O(media bytes);
mp4's stsz/stco tables give exactly that, and the decode bill scales
with frames KEPT (1/every_n), not frames stored.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from window_probe import probe  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
N_VIDEOS = int(os.environ.get("VIDEO_N", "240"))
FRAMES_PER = int(os.environ.get("VIDEO_FRAMES", "40"))
W, H = 64, 48
EVERY_N = 10


def main():
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
    )

    from overmatch_spark.operators.multimodal import sample_frames
    from overmatch_spark.session import get_spark

    spark = get_spark("bench-video", cpus=CPUS, shuffle_partitions=CPUS)
    p0 = probe()

    # distributed corpus build: one mux per video inside mapInPandas
    # (the encode bill is the corpus build, not the sampling path)
    vid_schema = StructType(
        [
            StructField("video_id", StringType()),
            StructField("bytes", BinaryType()),
        ]
    )

    def mux(batches):
        import pandas as pd

        from overmatch_spark.images import encode_video_mp4, gen_pixels

        for pdf in batches:
            out = {"video_id": [], "bytes": []}
            for r in pdf.itertuples(index=False):
                frames = [
                    gen_pixels(f"{r.video_id}#{j}", W, H)
                    for j in range(FRAMES_PER)
                ]
                out["video_id"].append(r.video_id)
                out["bytes"].append(encode_video_mp4(frames, fps=30))
            yield pd.DataFrame(out)

    ids = spark.range(N_VIDEOS).select(
        F.concat(F.lit("bv/"), F.col("id").cast("string")).alias("video_id")
    )
    t0 = time.time()
    corpus = (
        ids.repartition(CPUS)
        .select("video_id", F.lit(b"").alias("bytes"))
        .mapInPandas(mux, vid_schema)
    )
    corpus.persist().count()
    build_s = round(time.time() - t0, 2)
    total_bytes = corpus.select(
        F.sum(F.length("bytes")).alias("b")
    ).collect()[0]["b"]

    # timed section: demux + sample + decode of kept frames only
    t0 = time.time()
    frames = sample_frames(corpus, every_n=EVERY_N)
    n_out = frames.count()
    sample_s = round(time.time() - t0, 2)

    # invariant: sampled frames decode to >= 40 dB vs the originals
    def check(batches):
        import pandas as pd

        from overmatch_spark.images import gen_pixels, psnr_db

        for pdf in batches:
            ok = []
            for r in pdf.itertuples(index=False):
                orig = gen_pixels(f"{r.video_id}#{r.frame_idx}", W, H)
                dec = np.frombuffer(bytes(r.bytes), dtype=np.uint8).reshape(
                    H, W, 3
                )
                ok.append(bool(psnr_db(orig, dec) >= 40.0))
            yield pd.DataFrame({"ok": ok})

    okdf = frames.mapInPandas(check, "ok boolean")
    n_ok = okdf.filter("ok").count()
    p1 = probe()

    stored = N_VIDEOS * FRAMES_PER
    print(
        json.dumps(
            {
                "metric": "mp4 frame sampling (distributed demux + "
                          "decode of kept frames only)",
                "videos": N_VIDEOS,
                "frames_stored": stored,
                "frames_decoded": n_out,
                "decode_fraction": round(n_out / stored, 4),
                "invariant_psnr40_ok": f"{n_ok}/{n_out}",
                "corpus_mb": round(total_bytes / 1e6, 1),
                "build_sec": build_s,
                "sample_sec": sample_s,
                "videos_per_sec": round(N_VIDEOS / sample_s, 1),
                "decoded_frames_per_sec": round(n_out / sample_s, 1),
                "cpus": CPUS,
                "alu_probes": [p0["alu_mops"], p1["alu_mops"]],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
