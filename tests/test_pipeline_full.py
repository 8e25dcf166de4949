"""Full-pipeline integration: the ten reference stages chained through
the package's public operators on fake media (SURVEY.md §3.2), ending
in segments + summary — the regression form of the manual e2e drive."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_full_asd_pipeline(spark, tmp_path):
    from talknet_segmentation_batchprocessing_spark.operators.inference import (
        detect_faces,
        score_tracks,
    )
    from talknet_segmentation_batchprocessing_spark.operators.nms import nms
    from talknet_segmentation_batchprocessing_spark.operators.scenes import detect_scenes
    from talknet_segmentation_batchprocessing_spark.operators.segmentation import (
        extract_segments,
    )
    from talknet_segmentation_batchprocessing_spark.operators.tracking import track_faces
    from talknet_segmentation_batchprocessing_spark.sources.checkpoints import (
        checkpoint,
        restore,
    )
    from talknet_segmentation_batchprocessing_spark.sources.corpus import (
        scan_video_folder,
    )
    from talknet_segmentation_batchprocessing_spark.sources.media_ingest import (
        explode_frames,
        fake_decoder,
    )
    from talknet_segmentation_batchprocessing_spark.sources.segment_sink import (
        manifest_cutter,
        summary_report,
        write_segment_media,
    )
    from talknet_segmentation_batchprocessing_spark.schemas import SEGMENTS

    folder = tmp_path / "corpus"
    folder.mkdir()
    for n in ("clipA.mp4", "clipB.AVI"):
        (folder / n).write_bytes(n.encode() * 50)

    videos = scan_video_folder(spark, str(folder))                  # S1
    frames = explode_frames(videos, decoder=fake_decoder(n_frames=80))  # S3/S5
    scenes = detect_scenes(frames)                                  # M2
    dets = detect_faces(frames)                                     # M1 + F1
    kept = nms(dets, overlap=0.3, top_k=10)                         # W6
    with_scene = kept.join(
        scenes,
        on=[
            kept.video_id == scenes.video_id,
            (kept.frame_idx >= scenes.start_frame) & (kept.frame_idx < scenes.end_frame),
        ],
    ).select(kept["*"], scenes.scene_id)
    tracks = track_faces(with_scene, min_track=10)                  # J6 + F3
    scores = score_tracks(tracks.select("video_id", "track_id", "frame_idx"))  # M3/A1/W9
    segs = extract_segments(scores, threshold=0.0, min_duration_s=0.2)  # W1/F5/F6/X10
    root = str(tmp_path / "stages")
    checkpoint(segs, root, "segments")                              # S7
    back = restore(spark, root, "segments", schema=SEGMENTS)

    seg_pdf = back.toPandas()
    assert len(seg_pdf) > 0
    assert (seg_pdf.end_frame > seg_pdf.start_frame).all()
    np.testing.assert_allclose(seg_pdf.start_ts, seg_pdf.start_frame / 25.0)

    out = str(tmp_path / "cuts")
    write_segment_media(back, videos.select("video_id", "path"), manifest_cutter(out))  # S10
    assert len(os.listdir(out)) == len(seg_pdf)

    summary = summary_report(back).toPandas()                       # S11/A3
    assert set(summary.video_id) <= {"clipA", "clipB"}
    assert (summary.n_segments >= 1).all()


def test_scene_detection_finds_synthetic_cut(spark):
    from talknet_segmentation_batchprocessing_spark.operators.scenes import detect_scenes

    # 60 frames: constant dark until 29, constant bright after -> one cut at 30
    rows = []
    for f in range(60):
        level = 10 if f < 30 else 240
        rows.append(("v", f, bytes([level] * 64), 8, 8))
    frames = spark.createDataFrame(
        rows, "video_id string, frame_idx int, image binary, height int, width int"
    )
    scenes = detect_scenes(frames).toPandas().sort_values("scene_id")
    assert len(scenes) == 2
    assert scenes.iloc[0].start_frame == 0 and scenes.iloc[0].end_frame == 30
    assert scenes.iloc[1].start_frame == 30 and scenes.iloc[1].end_frame == 60


def test_iter_dataset_source(spark):
    from talknet_segmentation_batchprocessing_spark.sources.corpus import (
        iter_dataset_source,
    )

    samples = ({"video_id": f"v{i}", "path": f"/x/v{i}.mp4", "byte_len": i} for i in range(5))
    df = iter_dataset_source(spark, samples, batch_size=2)
    pdf = df.toPandas().sort_values("video_id")
    assert pdf.video_id.tolist() == [f"v{i}" for i in range(5)]
    empty = iter_dataset_source(spark, [])
    assert empty.count() == 0


def test_iter_dataset_source_is_lazy(spark):
    """The adapter must never materialize the whole iterator on the
    driver: consumption happens in batch_size chunks via islice. A
    generator that counts its peak un-consumed position proves only
    one batch is pulled ahead of each createDataFrame call — list()ing
    it first (the old bug) would drain all rows before any batch."""
    from talknet_segmentation_batchprocessing_spark.sources.corpus import (
        iter_dataset_source,
    )

    pulled = []

    def gen():
        for i in range(10):
            pulled.append(i)
            yield {"video_id": f"v{i}", "path": f"/x/{i}", "byte_len": i}

    class ChunkSpy:
        """Wraps spark; records how many rows were pulled when each
        createDataFrame fires."""

        def __init__(self, inner):
            self._inner = inner
            self.pull_marks = []

        def createDataFrame(self, data, schema):
            self.pull_marks.append(len(pulled))
            return self._inner.createDataFrame(data, schema)

    spy = ChunkSpy(spark)
    df = iter_dataset_source(spy, gen(), batch_size=3)
    assert df.count() == 10
    # first batch fired after only 3 rows were drawn, not all 10
    assert spy.pull_marks[0] == 3
    assert spy.pull_marks == [3, 6, 9, 10]


def test_full_pipeline_real_forward(spark, tmp_path):
    """The media pipeline driving the REAL numpy TalkNet forward: fake
    decode -> detect -> track -> featurize (face crops + per-track
    MFCC, demoTalkNet.py:178-223) -> ensemble scoring -> segments.
    Everything but the codec and the learned weights is the production
    path."""
    from talknet_segmentation_batchprocessing_spark.operators.featurize import (
        featurize_tracks,
    )
    from talknet_segmentation_batchprocessing_spark.operators.inference import (
        detect_faces,
        score_tracks,
    )
    from talknet_segmentation_batchprocessing_spark.operators.scenes import detect_scenes
    from talknet_segmentation_batchprocessing_spark.operators.segmentation import (
        extract_segments,
    )
    from talknet_segmentation_batchprocessing_spark.operators.talknet_forward import (
        talknet_scorer,
    )
    from talknet_segmentation_batchprocessing_spark.operators.tracking import track_faces
    from talknet_segmentation_batchprocessing_spark.sources.corpus import (
        scan_video_folder,
    )
    from talknet_segmentation_batchprocessing_spark.sources.media_ingest import (
        explode_frames,
        extract_audio,
        fake_decoder,
    )

    folder = tmp_path / "corpus"
    folder.mkdir()
    (folder / "clipC.mp4").write_bytes(b"clipC" * 40)

    videos = scan_video_folder(spark, str(folder))
    dec = fake_decoder(n_frames=30)
    frames = explode_frames(videos, decoder=dec)
    audio = extract_audio(videos, decoder=dec)
    scenes = detect_scenes(frames)
    dets = detect_faces(frames)
    with_scene = dets.join(
        scenes,
        on=[
            dets.video_id == scenes.video_id,
            (dets.frame_idx >= scenes.start_frame)
            & (dets.frame_idx < scenes.end_frame),
        ],
    ).select(dets["*"], scenes.scene_id)
    tracks = track_faces(with_scene, min_track=10)
    feats = featurize_tracks(tracks, frames, audio)
    fpdf = feats.toPandas()
    assert len(fpdf) > 0
    assert all(len(m) == 4 * 13 for m in fpdf.mfcc)
    assert all(len(f) == 112 * 112 for f in fpdf.face)

    scores = score_tracks(
        feats,
        model_builder=lambda _state: talknet_scorer(seed=11),
        durations=[1],
    )
    spdf = scores.toPandas()
    assert len(spdf) == len(fpdf)
    assert np.isfinite(spdf.score).all()

    segs = extract_segments(scores, threshold=float(spdf.score.median()),
                            min_duration_s=0.12).toPandas()
    # with a median threshold there is at least one above-threshold run
    assert (segs.end_frame > segs.start_frame).all()


def test_iter_dataset_source_spill_dir_bounded(spark, tmp_path):
    """spill_dir mode: batches land in parquet as they are consumed
    and the result is a scan — the corpus-scale path where driver
    memory stays one-batch-bounded (no accumulated LocalRelations)."""
    from talknet_segmentation_batchprocessing_spark.sources.corpus import (
        iter_dataset_source,
    )

    samples = (
        {"video_id": f"v{i:03d}", "path": f"/x/v{i}.mp4", "byte_len": i}
        for i in range(25)
    )
    spill = str(tmp_path / "spill")
    df = iter_dataset_source(spark, samples, batch_size=4, spill_dir=spill)
    # the plan must be a file scan of the spill dir, not a union of
    # in-memory relations
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan and "Union" not in plan
    pdf = df.toPandas().sort_values("video_id")
    assert pdf.video_id.tolist() == [f"v{i:03d}" for i in range(25)]
    assert pdf.byte_len.sum() == sum(range(25))

    empty = iter_dataset_source(
        spark, [], spill_dir=str(tmp_path / "spill_empty")
    )
    assert empty.count() == 0
