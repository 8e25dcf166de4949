"""Explicit StructType registry for every table in the engine's data
model (SURVEY.md §1, FIXTURES.md).

The reference keeps schemas implicit (python dicts, numpy arrays,
pickles, CSV conventions); every abstraction here gets a fixed schema.
Time base: 25 fps, ``ts = frame_idx / 25.0``
(reference demoTalkNet.py:489, extractSpeakingSegments.py:126).
"""

from __future__ import annotations

from pyspark.sql import types as T

FPS = 25.0
SAMPLE_RATE = 16000  # reference demoTalkNet.py:499 (16 kHz mono pcm_s16le)

# -- corpus scan (reference batchProcessVideos.py:93-106) --------------------
VIDEOS = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("path", T.StringType(), True),
        T.StructField("ext", T.StringType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("fps", T.DoubleType(), True),
    ]
)

# -- shot list (reference demoTalkNet.py:93-110); end_frame exclusive --------
SCENES = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("scene_id", T.IntegerType(), False),
        T.StructField("start_frame", T.IntegerType(), False),
        T.StructField("end_frame", T.IntegerType(), False),
    ]
)

# -- per-frame face boxes (reference demoTalkNet.py:118-128) -----------------
DETECTIONS = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("det_id", T.IntegerType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("x2", T.DoubleType(), False),
        T.StructField("y2", T.DoubleType(), False),
        T.StructField("conf", T.DoubleType(), False),
    ]
)

# -- exploded face tracks (reference demoTalkNet.py:168-216): one row per
# (track, frame), dense frame axis after interpolation --------------------
TRACKS = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("track_id", T.IntegerType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("x1", T.DoubleType(), True),
        T.StructField("y1", T.DoubleType(), True),
        T.StructField("x2", T.DoubleType(), True),
        T.StructField("y2", T.DoubleType(), True),
        T.StructField("cx", T.DoubleType(), True),
        T.StructField("cy", T.DoubleType(), True),
        T.StructField("size", T.DoubleType(), True),
    ]
)

# -- per-frame ASD scores (reference demoTalkNet.py:256-271) -----------------
SCORES = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("track_id", T.IntegerType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# -- speaking segments (reference extractSpeakingSegments.py:91-123);
# start inclusive / end exclusive, ts = frame/25 ---------------------------
SEGMENTS = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("track_id", T.IntegerType(), False),
        T.StructField("seg_id", T.IntegerType(), False),
        T.StructField("start_frame", T.IntegerType(), False),
        T.StructField("end_frame", T.IntegerType(), False),
        T.StructField("start_ts", T.DoubleType(), False),
        T.StructField("end_ts", T.DoubleType(), False),
        T.StructField("duration", T.DoubleType(), False),
    ]
)

# -- AVA eval CSVs (reference utils/get_ava_active_speaker_performance.py:182-193)
AVA_GROUNDTRUTH = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_timestamp", T.DoubleType(), False),
        T.StructField("entity_box_x1", T.DoubleType(), False),
        T.StructField("entity_box_y1", T.DoubleType(), False),
        T.StructField("entity_box_x2", T.DoubleType(), False),
        T.StructField("entity_box_y2", T.DoubleType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("label_id", T.IntegerType(), True),
        T.StructField("instance_id", T.StringType(), True),
    ]
)

AVA_PREDICTIONS = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_timestamp", T.DoubleType(), False),
        T.StructField("entity_box_x1", T.DoubleType(), False),
        T.StructField("entity_box_y1", T.DoubleType(), False),
        T.StructField("entity_box_x2", T.DoubleType(), False),
        T.StructField("entity_box_y2", T.DoubleType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# -- Columbia eval tables (reference demoTalkNet.py:372-419) -----------------
COL_LABELS = T.StructType(
    [
        T.StructField("speaker_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("x2", T.DoubleType(), False),
        T.StructField("y2", T.DoubleType(), False),
        T.StructField("gt", T.IntegerType(), False),
    ]
)

COL_FACES = T.StructType(
    [
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("track_id", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("cx", T.DoubleType(), False),
        T.StructField("cy", T.DoubleType(), False),
        T.StructField("size", T.DoubleType(), False),
    ]
)

# -- training trial list (reference dataLoader.py:94-118) --------------------
TRIALS = T.StructType(
    [
        T.StructField("data_name", T.StringType(), False),
        T.StructField("num_frames", T.IntegerType(), False),
        T.StructField("fps", T.DoubleType(), False),
        T.StructField("labels", T.StringType(), False),  # "[0,1,...]" -> X11 parse
    ]
)

# -- TalkSet 9-field clip list (reference TalkSet/README.md:32-46) -----------
TALKSET_LIST = T.StructType(
    [
        T.StructField("clip_type", T.StringType(), False),
        T.StructField("audio_path", T.StringType(), False),
        T.StructField("video_path", T.StringType(), False),
        T.StructField("length_s", T.DoubleType(), False),
        T.StructField("start_T", T.DoubleType(), False),
        T.StructField("end_T", T.DoubleType(), False),
        T.StructField("start_F", T.DoubleType(), False),
        T.StructField("end_F", T.DoubleType(), False),
        T.StructField("file_id", T.StringType(), False),
    ]
)

# -- media-shell tables (SURVEY.md §1.1) -------------------------------------
FRAMES = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts", T.DoubleType(), False),
        T.StructField("image", T.BinaryType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
    ]
)

AUDIO = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("sr", T.IntegerType(), False),
        T.StructField("samples", T.ArrayType(T.ShortType()), True),
    ]
)

TABLES = {
    "videos": VIDEOS,
    "scenes": SCENES,
    "detections": DETECTIONS,
    "tracks": TRACKS,
    "scores": SCORES,
    "segments": SEGMENTS,
    "ava_groundtruth": AVA_GROUNDTRUTH,
    "ava_predictions": AVA_PREDICTIONS,
    "col_labels": COL_LABELS,
    "col_faces": COL_FACES,
    "trials": TRIALS,
    "talkset_list": TALKSET_LIST,
    "frames": FRAMES,
    "audio": AUDIO,
}
