"""Component-level timing of the media headliners at sf0.1 (guide §1:
isolate each expensive query with the noop sink; label jobs). Each
component is a prefix of the real query's plan, so the deltas attribute
the wall to generation / Python kernel / JVM signature / pair machinery.

Usage: python scripts/r12_profile_media.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(spark, label, df, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(label)
        df.write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    print(f"{label:55s} {best:7.3f}s (min of {reps})")
    return best


def main():
    from pyspark.sql import functions as F

    from timer_pulsar_spark.session import get_spark
    from timer_pulsar_spark.operators import multimodal as mm
    from timer_pulsar_spark.operators.dedup import spread
    from timer_pulsar_spark.catalog import load_table

    spark = get_spark("r12_profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # ---- q_audio_pipeline components -------------------------------
    wavs = mm.planted_wavs_decoy(spark, SF, with_content=True)
    t(spark, "audio_pipeline: corpus generation only", wavs)
    canon = mm.audio_canonical_pcm(wavs)
    t(spark, "audio_pipeline: generation + python walk", canon)
    sig = mm.energy_sig64_s16(canon, payload_col="pcm16")
    t(spark, "audio_pipeline: + jvm signature", sig)
    t(spark, "audio_pipeline: full (with orderBy)",
      mm.q_audio_pipeline(spark, SF))

    # ---- q_audio_dedup components ----------------------------------
    pcm = mm.planted_pcm(spark, SF)
    t(spark, "audio_dedup: corpus generation only", pcm)
    s8 = mm.energy_sig64(pcm)
    t(spark, "audio_dedup: + jvm signature", s8)
    t(spark, "audio_dedup: full (pairs + orderBy)",
      mm.q_audio_dedup(spark, SF))

    # ---- q_video_dedup components ----------------------------------
    mp4 = mm.planted_mp4s_frames(spark, SF)
    t(spark, "video_dedup: corpus generation only", mp4)
    fe = mm.video_frame_energies(mp4)
    t(spark, "video_dedup: generation + python walk", fe)
    vs = mm.video_sig64(fe)
    t(spark, "video_dedup: + jvm signature", vs)
    t(spark, "video_dedup: full (pairs + orderBy)",
      mm.q_video_dedup(spark, SF))

    # ---- q_image_dhash_real components -----------------------------
    files = mm.planted_bitmap_files(spark, SF)
    t(spark, "image_dhash_real: corpus generation only", files)
    grid = mm.image_grid_walk(files)
    t(spark, "image_dhash_real: + python decode/downsample", grid)
    t(spark, "image_dhash_real: full", mm.q_image_dhash_real(spark, SF))

    # ---- q_image_dedup components ----------------------------------
    bmps = mm.planted_bitmaps(spark, SF)
    t(spark, "image_dedup: corpus generation only", bmps)
    dh = mm.dhash64(bmps)
    t(spark, "image_dedup: + jvm dhash", dh)
    t(spark, "image_dedup: full (pairs + orderBy)",
      mm.q_image_dedup(spark, SF))

    # ---- q_audio_meta_real -----------------------------------------
    wavs_meta = mm.planted_wavs_decoy(spark, SF)
    t(spark, "audio_meta_real: corpus generation only", wavs_meta)
    t(spark, "audio_meta_real: full",
      mm.q_audio_meta_real(spark, SF))

    spark.stop()


if __name__ == "__main__":
    main()
