"""Unit tests for the media/NN shells and sources (SURVEY.md §5: shells
are seeded-unit-tested, not oracle-checked): deterministic fakes, real
Spark plumbing — schemas, fan-out shape, partition behavior."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def videos_df(spark):
    return spark.createDataFrame(
        [("vidA", "/data/vidA.mp4"), ("vidB", "/data/vidB.mp4")],
        "video_id string, path string",
    )


def test_explode_frames_shape_and_timebase(spark, videos_df):
    from talknet_segmentation_batchprocessing_spark.sources.media_ingest import (
        explode_frames,
        fake_decoder,
    )

    frames = explode_frames(videos_df, decoder=fake_decoder(n_frames=10)).toPandas()
    assert len(frames) == 20  # 2 videos x 10 frames
    one = frames[frames.video_id == "vidA"].sort_values("frame_idx")
    assert list(one.frame_idx) == list(range(10))
    assert one.ts.tolist() == [i / 25.0 for i in range(10)]  # X10 time base
    assert all(len(b) == 64 for b in one.image)  # 8x8 uint8 payload


def test_explode_frames_deterministic(spark, videos_df):
    from talknet_segmentation_batchprocessing_spark.sources.media_ingest import (
        explode_frames,
    )

    a = explode_frames(videos_df).toPandas().sort_values(["video_id", "frame_idx"])
    b = explode_frames(videos_df).toPandas().sort_values(["video_id", "frame_idx"])
    assert a.image.tolist() == b.image.tolist()


def test_extract_audio_chunking(spark, videos_df):
    from talknet_segmentation_batchprocessing_spark.sources.media_ingest import (
        extract_audio,
        fake_decoder,
    )

    audio = extract_audio(videos_df, decoder=fake_decoder(n_frames=50)).toPandas()
    one = audio[audio.video_id == "vidA"].sort_values("chunk_idx")
    # 50 frames / 25 fps = 2 s -> 2 chunks of 16000 samples
    assert list(one.chunk_idx) == [0, 1]
    assert all(one.sr == 16000)
    assert sum(len(s) for s in one.samples) == 32000


def test_detect_faces_fanout_and_conf_filter(spark, videos_df):
    from talknet_segmentation_batchprocessing_spark.operators.inference import (
        detect_faces,
    )
    from talknet_segmentation_batchprocessing_spark.sources.media_ingest import (
        explode_frames,
        fake_decoder,
    )

    frames = explode_frames(videos_df, decoder=fake_decoder(n_frames=30))
    dets = detect_faces(frames, conf_th=0.9).toPandas()
    assert set(dets.columns) == {
        "video_id", "frame_idx", "det_id", "x1", "y1", "x2", "y2", "conf"
    }
    assert (dets.conf > 0.9).all()  # F1 strict threshold inside the shell
    assert (dets.x2 > dets.x1).all() and (dets.y2 > dets.y1).all()
    # deterministic across reruns
    dets2 = detect_faces(frames, conf_th=0.9).toPandas()
    pd.testing.assert_frame_equal(
        dets.sort_values(["video_id", "frame_idx", "det_id"]).reset_index(drop=True),
        dets2.sort_values(["video_id", "frame_idx", "det_id"]).reset_index(drop=True),
    )


def test_detect_faces_with_real_s3fd_postprocessing(spark, videos_df):
    """M1 through the Spark shell with the REAL post-processing path:
    fake heads -> priors/decode/NMS (s3fd_post) -> detection rows."""
    from talknet_segmentation_batchprocessing_spark.operators.inference import (
        detect_faces,
        s3fd_detector,
    )
    from talknet_segmentation_batchprocessing_spark.sources.media_ingest import (
        explode_frames,
        fake_decoder,
    )

    frames = explode_frames(videos_df, decoder=fake_decoder(n_frames=20))
    dets = detect_faces(
        frames, model_builder=lambda _state: s3fd_detector(), conf_th=0.9
    ).toPandas()
    assert len(dets) > 0
    assert (dets.conf > 0.9).all()
    assert (dets.x2 > dets.x1).all() and (dets.y2 > dets.y1).all()
    # det_id is NMS rank: score-descending within each frame
    by_frame = dets.sort_values(["video_id", "frame_idx", "det_id"])
    for _, grp in by_frame.groupby(["video_id", "frame_idx"]):
        assert (grp.conf.diff().dropna() <= 1e-12).all()
    # deterministic across reruns
    dets2 = detect_faces(
        frames, model_builder=lambda _state: s3fd_detector(), conf_th=0.9
    ).toPandas()
    pd.testing.assert_frame_equal(
        dets.sort_values(["video_id", "frame_idx", "det_id"]).reset_index(drop=True),
        dets2.sort_values(["video_id", "frame_idx", "det_id"]).reset_index(drop=True),
    )


def test_score_tracks_ensemble(spark):
    from talknet_segmentation_batchprocessing_spark.operators.inference import (
        score_tracks,
    )

    feats = spark.createDataFrame(
        [("v", t, f) for t in (0, 1) for f in range(60)],
        "video_id string, track_id int, frame_idx int",
    )
    scores = score_tracks(feats).toPandas()
    assert len(scores) == 120  # one score per (track, frame)
    assert scores.score.between(-2.0, 2.0).all()
    # X14: rounded to 1 decimal
    assert (scores.score * 10 % 1 == 0).all()


def test_segment_sink_manifest_and_summary(spark, tmp_path):
    from talknet_segmentation_batchprocessing_spark.operators.segmentation import (
        extract_segments,
    )
    from talknet_segmentation_batchprocessing_spark.sources.segment_sink import (
        format_summary,
        manifest_cutter,
        summary_report,
        write_segment_media,
    )

    scores = spark.createDataFrame(
        [("v", 0, f, 1.0 if 5 <= f < 30 else -1.0) for f in range(50)],
        "video_id string, track_id int, frame_idx int, score double",
    )
    segs = extract_segments(scores, threshold=0.0, min_duration_s=0.5)
    seg_rows = segs.toPandas()
    assert len(seg_rows) == 1
    assert (seg_rows.start_frame[0], seg_rows.end_frame[0]) == (5, 30)  # end exclusive

    out_dir = str(tmp_path / "cuts")
    paths = spark.createDataFrame([("v", "/data/v.mp4")], "video_id string, path string")
    write_segment_media(segs, paths, manifest_cutter(out_dir))
    manifests = os.listdir(out_dir)
    assert manifests == ["v_t00000_s00000.json"]

    summary = summary_report(segs)
    text = format_summary(summary.collect())
    assert "video v track 0: 1 segment(s), 1.00s speaking" in text


def test_scan_video_folder(spark, tmp_path):
    from talknet_segmentation_batchprocessing_spark.sources.corpus import (
        scan_video_folder,
    )

    for name in ("a.mp4", "b.MP4", "c.avi", "d.txt"):
        (tmp_path / name).write_bytes(b"xx" + name.encode())
    df = scan_video_folder(spark, str(tmp_path)).toPandas()
    assert sorted(df.video_id) == ["a", "b", "c"]  # case-insensitive, txt excluded
    assert set(df.ext) == {"mp4", "avi"}
    assert "content" not in df.columns  # payload pruned by default


def test_csv_roundtrip_predictions(spark, tmp_path):
    from talknet_segmentation_batchprocessing_spark.sources.csv_io import (
        write_predictions_csv,
    )

    preds = spark.createDataFrame(
        [("v", 1.0, 0.7, 3, "i1")],
        "video_id string, frame_timestamp double, score double, label_id int, instance_id string",
    )
    out = str(tmp_path / "preds")
    write_predictions_csv(preds, out)
    back = spark.read.csv(out, header=True).toPandas()
    assert "label" in back.columns and back.label[0] == "SPEAKING_AUDIBLE"
    assert "label_id" not in back.columns and "instance_id" not in back.columns


def test_checkpoint_roundtrip(spark, tmp_path):
    from talknet_segmentation_batchprocessing_spark.sources.checkpoints import (
        checkpoint,
        has_stage,
        restore,
    )

    df = spark.createDataFrame(
        [("v1", 1, 0.5), ("v2", 2, 0.7)], "video_id string, frame_idx int, score double"
    )
    root = str(tmp_path / "stages")
    checkpoint(df, root, "scores")
    assert has_stage(root, "scores")
    back = restore(spark, root, "scores").toPandas().sort_values("frame_idx")
    assert back.score.tolist() == [0.5, 0.7]


def test_multimodal_features(spark):
    from talknet_segmentation_batchprocessing_spark.operators.multimodal import (
        attach_binary_meta,
        extract_image_features,
        fake_image_decoder,
        sample_video_frames,
    )

    docs = spark.createDataFrame(
        [(1, bytearray(b"imgpayload1")), (2, bytearray(b"imgpayload2"))],
        "doc_id long, payload binary",
    )
    meta = attach_binary_meta(docs, "payload", "doc_id").toPandas()
    assert meta.byte_len.tolist() == [11, 11]
    assert meta.content_sha.nunique() == 2

    feats = extract_image_features(
        docs, "payload", "doc_id", decoder=fake_image_decoder(16, 16)
    ).toPandas()
    assert all(len(f) == 64 for f in feats.feature)  # 8x8 block means
    assert all(0.0 <= x <= 1.0 for f in feats.feature for x in f)

    frames = spark.range(100).select(F.col("id").cast("int").alias("frame_idx"))
    sampled = sample_video_frames(frames, every_n=25).toPandas()
    assert sampled.frame_idx.tolist() == [0, 25, 50, 75]


def test_video_corpus_datasource(spark, tmp_path):
    from talknet_segmentation_batchprocessing_spark.sources import datasource

    for name in ("x.mp4", "y.mkv", "skip.txt"):
        (tmp_path / name).write_bytes(name.encode() * 3)
    datasource.register(spark)
    df = (
        spark.read.format("video_corpus")
        .option("path", str(tmp_path))
        .load()
    )
    pdf = df.toPandas().sort_values("video_id")
    assert pdf.video_id.tolist() == ["x", "y"]
    assert "content" not in pdf.columns  # metadata-only by default
    full = (
        spark.read.format("video_corpus")
        .option("path", str(tmp_path))
        .option("with_content", "true")
        .load()
        .toPandas()
        .sort_values("video_id")
    )
    assert full.content.iloc[0] == b"x.mp4" * 3
    # composes with the relational surface (filter + projection)
    n = df.filter("ext = 'mp4'").count()
    assert n == 1


def test_detect_batch_equals_per_row(spark, videos_df):
    """The Arrow-batch detector path (one model invocation per batch —
    the real-NN shape) produces exactly the per-row path's rows."""
    import pandas as pd

    from talknet_segmentation_batchprocessing_spark.operators.inference import (
        detect_faces,
        s3fd_detector,
    )
    from talknet_segmentation_batchprocessing_spark.sources.media_ingest import (
        explode_frames,
        fake_decoder,
    )

    frames = explode_frames(videos_df, decoder=fake_decoder(n_frames=15))

    def row_only_builder(_state):
        det = s3fd_detector()
        del det.detect_batch  # force the per-row fallback
        return det

    batched = detect_faces(frames, model_builder=lambda _s: s3fd_detector()).toPandas()
    per_row = detect_faces(frames, model_builder=row_only_builder).toPandas()
    key = ["video_id", "frame_idx", "det_id"]
    pd.testing.assert_frame_equal(
        batched.sort_values(key).reset_index(drop=True),
        per_row.sort_values(key).reset_index(drop=True),
    )


def test_video_corpus_stream_rate_limit_and_resume(spark, tmp_path):
    """TRUE incremental S2 (batchProcessVideos.py:111-124): the
    video_corpus format under readStream consumes the folder
    sequentially at max_files_per_batch per micro-batch, and a
    restarted query resumes from the committed offset — new files
    only, no reprocessing."""
    from talknet_segmentation_batchprocessing_spark.sources import datasource

    folder = tmp_path / "drop"
    folder.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out: list = []
    for i in range(3):
        (folder / f"clip{i:03d}.avi").write_bytes(b"x" * (i + 1))
    datasource.register(spark)

    def run_once():
        stream = (
            spark.readStream.format("video_corpus")
            .option("path", str(folder))
            .option("max_files_per_batch", "2")
            .load()
        )
        batches: list = []

        def sink(df, epoch_id):
            rows = df.collect()
            if rows:
                batches.append(sorted(r["video_id"] for r in rows))
            out.extend(rows)

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return batches

    # availableNow drains the prefetched batch then stops; each run is
    # one rate-limited step, and every restart resumes from the
    # checkpointed offset — loop until the first 3 files are consumed
    all_batches = []
    for _ in range(4):
        all_batches.extend(run_once())
        if len(out) >= 3:
            break
    assert sorted(r["video_id"] for r in out) == ["clip000", "clip001", "clip002"]
    # rate limit: no micro-batch ever carried more than 2 files
    assert all(len(b) <= 2 for b in all_batches)

    for i in range(3, 5):
        (folder / f"clip{i:03d}.avi").write_bytes(b"x")
    for _ in range(4):
        run_once()
        if len(out) >= 5:
            break
    ids = sorted(r["video_id"] for r in out)
    # resume processed ONLY the two new files (no clip000-002 dupes)
    assert ids == [f"clip{i:03d}" for i in range(5)]
