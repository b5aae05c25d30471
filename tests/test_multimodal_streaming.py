from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image_meta,
    extract_features,
    image_metadata,
    make_fake_media,
    resize_image,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_fake_media(spark, n=30)


def test_decode_image_meta_headers():
    import struct

    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + struct.pack(">II", 640, 480)
    assert decode_image_meta(png) == ("image/png", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    assert decode_image_meta(gif) == ("image/gif", 320, 200)
    assert decode_image_meta(None) == (None, None, None)
    assert decode_image_meta(b"garbage") == ("application/octet-stream", None, None)


def test_image_metadata_mapinpandas(spark, media):
    out = image_metadata(media).toPandas().set_index("media_id")
    src = media.toPandas().set_index("media_id")
    for mid, row in out.iterrows():
        if src.loc[mid, "kind"] == "image":
            assert row["width"] == src.loc[mid, "width"]
            assert row["height"] == src.loc[mid, "height"]
        assert row["n_bytes"] == len(src.loc[mid, "content"])
        assert isinstance(row["sha256"], str) and len(row["sha256"]) == 64


def test_extract_features_deterministic(spark, media):
    a = extract_features(media).toPandas().set_index("media_id")["features"]
    b = extract_features(media).toPandas().set_index("media_id")["features"]
    for mid in a.index:
        assert len(a[mid]) == FEATURE_DIM
        assert list(a[mid]) == list(b[mid])
        assert all(0.0 <= x <= 1.0 for x in a[mid])


def test_audio_metadata_wav_headers(spark, media):
    from data_quality_automated_evaluator_spark.operators.multimodal import (
        audio_metadata,
        decode_wav_meta,
        make_wav_bytes,
    )

    wav = make_wav_bytes(seconds=0.5, rate=16000, channels=2, bits=16)
    mime, rate, ch, bits, dur = decode_wav_meta(wav)
    assert (mime, rate, ch, bits) == ("audio/wav", 16000, 2, 16)
    assert abs(dur - 0.5) < 1e-9
    assert decode_wav_meta(b"not a wav") == (None, None, None, None, None)
    assert decode_wav_meta(None) == (None, None, None, None, None)

    out = (
        audio_metadata(media.filter(F.col("kind") == "audio"))
        .toPandas()
        .set_index("media_id")
    )
    assert len(out) > 0
    assert (out["mime"] == "audio/wav").all()
    assert (out["sample_rate"] >= 8000).all()
    assert (out["duration_sec"] > 0).all()


def test_resize_real_pngs_and_dirty_rows(spark, media):
    """resize_image is REAL for PNG and baseline JPEG: those fixture
    rows decode, resample and re-encode (format preserved); GIF/WAV/
    video rows come back as error rows, never task failures
    (dirty-input contract)."""
    from data_quality_automated_evaluator_spark.functions.jpeg import decode_jpeg
    from data_quality_automated_evaluator_spark.functions.png import decode_png

    out = resize_image(media, 64, 64).toPandas().set_index("media_id")
    assert len(out) == media.count()
    kinds = {r["media_id"]: r["mime"] for r in media.select("media_id", "mime").collect()}
    n_jpeg = 0
    for mid, row in out.iterrows():
        if kinds[mid] == "image/png":
            assert row["error"] is None, row["error"]
            assert decode_png(bytes(row["content"])).shape == (64, 64, 3)
        elif kinds[mid] == "image/jpeg":
            n_jpeg += 1
            assert row["error"] is None, row["error"]
            content = bytes(row["content"])
            assert content[:2] == b"\xff\xd8"  # stays a JPEG
            assert decode_jpeg(content).shape == (64, 64, 3)
        else:
            assert row["content"] is None and row["error"] is not None
    assert n_jpeg > 0  # the fixture actually contains real JPEGs


def test_sample_frames_real_mjpeg_and_fake_seam(spark, media):
    """sample_frames is REAL for MJPEG/AVI fixture rows (demuxed frames
    are decodable JPEGs) AND for uncompressed BI_RGB/I420 AVIs (frames
    re-emitted as decodable PNGs), is_real=True for both; it falls back
    to the deterministic digest fake (is_real=False, NULL bytes) for
    opaque video blobs — per-row, never a task failure."""
    import hashlib

    from data_quality_automated_evaluator_spark.functions.jpeg import decode_jpeg
    from data_quality_automated_evaluator_spark.functions.png import decode_png

    out = sample_frames(media.filter(F.col("kind") == "video"), every_n=2).toPandas()
    assert len(out) > 0
    assert set(out.columns) == {
        "media_id", "frame_idx", "frame_bytes", "frame_sha", "is_real"
    }
    assert (out["frame_idx"] % 2 == 0).all()
    real = out[out["is_real"]]
    fake = out[~out["is_real"]]
    assert len(real) > 0 and len(fake) > 0  # fixture has both kinds
    n_jpeg = n_png = 0
    for _, r in real.iterrows():
        img = bytes(r["frame_bytes"])
        if img[:2] == b"\xff\xd8":
            assert decode_jpeg(img).shape == (16, 24, 3)
            n_jpeg += 1
        else:
            assert decode_png(img).shape == (16, 24, 3)
            n_png += 1
        assert hashlib.sha256(img).hexdigest() == r["frame_sha"]
    # the fixture plants all three real codecs
    assert n_jpeg > 0 and n_png > 0
    assert fake["frame_bytes"].isna().all()


def test_sample_frames_fake_path_deterministic(spark, media):
    """Determinism contract of the digest-fake seam (the only remaining
    non-real video path — inter-frame codecs): frame_sha is a pure
    function of (content bytes, frame_idx), so two independent runs —
    and any future decoder swap-in validated against it — must emit
    byte-identical (media_id, frame_idx, frame_sha) sets, with sha
    derived from the blob's sha256 (never from timestamps, row order,
    or partitioning)."""
    import hashlib

    vids = media.filter(F.col("kind") == "video")
    a = sample_frames(vids, every_n=3).toPandas()
    b = sample_frames(vids.repartition(7), every_n=3).toPandas()
    key = ["media_id", "frame_idx"]
    a = a[~a["is_real"]].sort_values(key).reset_index(drop=True)
    b = b[~b["is_real"]].sort_values(key).reset_index(drop=True)
    assert len(a) > 0
    assert a[key + ["frame_sha"]].equals(b[key + ["frame_sha"]])
    # the documented contract: fake sha = sha256(content || frame_idx)
    src = {r["media_id"]: bytes(r["content"])
           for r in vids.select("media_id", "content").collect()}
    for _, r in a.iterrows():
        expect = hashlib.sha256(
            src[r["media_id"]] + str(int(r["frame_idx"])).encode()
        ).hexdigest()
        assert r["frame_sha"] == expect


def test_raw_avi_round_trip():
    """BI_RGB mux→demux is pixel-exact; I420 is close (4:2:0 chroma
    averaging + rounding) and exact on 2x2-uniform-chroma frames."""
    import numpy as np

    from data_quality_automated_evaluator_spark.functions.avi import (
        avi_codec,
        avi_meta,
        demux_raw_frames,
        mux_raw_avi,
    )

    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 256, (12, 20, 3), dtype=np.uint8)
              for _ in range(4)]
    rgb = mux_raw_avi(frames, fps=5, codec="rgb")
    assert avi_codec(rgb) == "RGB"
    meta = avi_meta(rgb)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (20, 12, 4)
    out = list(demux_raw_frames(rgb))
    assert len(out) == 4
    for (k, px), src in zip(out, frames):
        assert px.dtype == np.uint8 and px.shape == (12, 20, 3)
        assert (px == src).all()  # BI_RGB is lossless

    # smooth gradients: chroma varies slowly, so 4:2:0 subsampling error
    # stays small (random noise would be the chroma worst case)
    yy, xx = np.mgrid[0:12, 0:20]
    grads = [
        np.stack([(xx * 3 + k) % 256, (yy * 5 + k) % 256,
                  ((xx + yy) * 2 + k) % 256], axis=2).astype(np.uint8)
        for k in range(3)
    ]
    i420 = mux_raw_avi(grads, fps=5, codec="i420")
    assert avi_codec(i420) == "I420"
    for (k, px), src in zip(demux_raw_frames(i420), grads):
        assert px.shape == (12, 20, 3)
        assert np.abs(px.astype(int) - src.astype(int)).mean() < 8

    # exact I420 round-trip when each 2x2 block is one flat color
    flat = np.repeat(np.repeat(
        rng.randint(0, 256, (6, 10, 3), dtype=np.uint8), 2, 0), 2, 1)
    (_, px), = list(demux_raw_frames(mux_raw_avi([flat], codec="i420")))
    assert np.abs(px.astype(int) - flat.astype(int)).max() <= 2  # rounding only


def test_raw_avi_rejects_non24bpp_bi_rgb():
    """A valid BI_RGB AVI with biBitCount=32 must be refused, not
    silently decoded as 24bpp garbage (its payload can still pass the
    stride*h length check)."""
    import struct

    import numpy as np
    import pytest

    from data_quality_automated_evaluator_spark.functions.avi import (
        AviFormatError,
        avi_codec,
        demux_raw_frames,
        mux_raw_avi,
    )

    frames = [np.zeros((8, 16, 3), dtype=np.uint8)]
    data = bytearray(mux_raw_avi(frames, fps=5, codec="rgb"))
    strf = bytes(data).index(b"strf") + 8  # chunk id + size
    assert struct.unpack("<H", data[strf + 14 : strf + 16])[0] == 24
    data[strf + 14 : strf + 16] = struct.pack("<H", 32)
    patched = bytes(data)
    assert avi_codec(patched) == "RGB32"
    with pytest.raises(AviFormatError):
        list(demux_raw_frames(patched))


def test_streaming_quality(spark, tmp_path):
    """Drive the streaming pipeline with a file source → memory sink."""
    from data_quality_automated_evaluator_spark.streaming.quality_stream import (
        STATELESS_RULES,
        streaming_interval_stats,
        streaming_turn_quality,
    )
    from data_quality_automated_evaluator_spark.testdata import generate_transcripts

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    pdf = generate_transcripts(n_convs=100, seed=11)
    sdf = spark.createDataFrame(pdf)
    sdf.coalesce(2).write.mode("overwrite").parquet(str(src_dir))

    stream = spark.readStream.schema(sdf.schema).parquet(str(src_dir))
    assert stream.isStreaming
    quality = streaming_turn_quality(stream)

    q = (
        quality.select("conv_id", "turn_idx", "keep_turn", *STATELESS_RULES)
        .writeStream.format("memory")
        .queryName("turns_q")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from turns_q").toPandas()
    assert len(got) == len(pdf)
    assert got["keep_turn"].notna().all()

    # windowed stats stream (complete mode into memory)
    stats = streaming_interval_stats(streaming_turn_quality(stream))
    q2 = (
        stats.writeStream.format("memory")
        .queryName("stats_q")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    st = spark.sql("select * from stats_q").toPandas()
    assert len(st) > 10  # many daily windows
    assert (st["n_turns"] > 0).all()
    assert st["keep_rate"].between(0, 1).all()

    # batch-parity: streaming stateless keep equals batch stateless keep
    from data_quality_automated_evaluator_spark.pipeline.oracle import oracle_quality

    o = oracle_quality(pdf)
    o_keep = o[STATELESS_RULES].all(axis=1)
    got_s = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (got_s["keep_turn"].values == o_keep.values).mean() > 0.999


def test_wav_malformed_bits_yields_none_duration():
    """A fmt chunk declaring bits_per_sample in 1..7 must not
    ZeroDivisionError the task — duration degrades to None."""
    import struct

    from data_quality_automated_evaluator_spark.operators.multimodal import (
        decode_wav_meta,
    )

    fmt_body = struct.pack("<HHIIHH", 1, 1, 16000, 16000, 1, 4)  # bits=4
    data = b"\x00" * 64
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
    )
    mime, rate, channels, bits, duration = decode_wav_meta(wav)
    assert mime == "audio/wav" and rate == 16000 and bits == 4
    assert duration is None


def test_streaming_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark dedupes re-delivered turns across
    micro-batches with watermark-bounded key state."""
    from data_quality_automated_evaluator_spark.streaming.quality_stream import (
        streaming_dedup,
    )
    from data_quality_automated_evaluator_spark.testdata import generate_transcripts

    src_dir = tmp_path / "dedup_src"
    src_dir.mkdir()
    pdf = generate_transcripts(n_convs=40, seed=5)
    sdf = spark.createDataFrame(pdf)
    # file 1: originals; file 2: redelivery of half the turns
    sdf.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "b1"))
    sdf.limit(len(pdf) // 2).coalesce(1).write.mode("overwrite").parquet(
        str(src_dir / "b2")
    )

    stream = spark.readStream.schema(sdf.schema).option(
        "recursiveFileLookup", "true").parquet(str(src_dir))
    out = streaming_dedup(stream, watermark="365 days")
    q = (
        out.select("conv_id", "turn_idx")
        .writeStream.format("memory").queryName("dedup_q")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_q").toPandas()
    # every (conv_id, turn_idx) exactly once despite redelivery
    assert len(got) == len(pdf)
    assert not got.duplicated(["conv_id", "turn_idx"]).any()


def test_streaming_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """session_window on a file stream (availableNow, complete mode)
    must produce exactly the batch sessionization of the same input."""
    from data_quality_automated_evaluator_spark.streaming.quality_stream import (
        streaming_sessionize,
    )

    src = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        "ts IS NOT NULL AND user_id IS NOT NULL"
    ).select("user_id", "ts")
    # split into several files so the stream sees real micro-batches
    src_dir = str(tmp_path / "events_stream")
    src.repartition(3).write.parquet(src_dir)

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    # files arrive in arbitrary (non-time) order, so a short watermark
    # would legitimately drop "late" micro-batches; parity needs a
    # watermark wider than the data span (lateness policy is exercised
    # separately by the interval-stats stream tests)
    q = (
        streaming_sessionize(stream, watermark="3650 days")
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT * FROM sess_stream ORDER BY user_id, session_start"
    ).collect()
    expect = (
        src.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in expect]
    assert len(got) > 100
