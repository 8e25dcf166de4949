"""streaming/stateful_v2.py — transformWithStateInPandas segmentation:
processor-logic parity with the v1 operator via a fake state handle
(always runs), plus end-to-end streaming tests that require a working
google.protobuf (the transformWithState state-IPC dependency — broken
in this image, so those two are skip-gated like the PyAV/cv2 media
paths)."""

from __future__ import annotations

import time

import pandas as pd
import pytest

from talknet_segmentation_batchprocessing_spark.schemas import SCORES
from talknet_segmentation_batchprocessing_spark.streaming.stateful_v2 import (
    ROCKSDB_PROVIDER,
    SegmentProcessor,
    stateful_segments_v2,
)


def _protobuf_works() -> bool:
    from talknet_segmentation_batchprocessing_spark.deploy import (
        ensure_protobuf_runtime,
    )

    return ensure_protobuf_runtime()


needs_protobuf = pytest.mark.skipif(
    not _protobuf_works(),
    reason="transformWithStateInPandas state IPC needs the protobuf "
    "runtime: `pip install protobuf==6.33.0` (the version pyspark's "
    "vendored StateMessage_pb2.py gencode targets — see README "
    "'Optional dependencies'), or a vendored pure-python runtime "
    "deploy.ensure_protobuf_runtime can shim; neither found on this "
    "image. Processor logic is covered by the fake-handle test below",
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())


def test_processor_logic_matches_v1_batch_kernel():
    """Drive SegmentProcessor.handleInputRows directly with a fake
    ValueState across two 'micro-batches' and compare against the v1
    kernel (_segment_batch) with an equivalent fake GroupState."""
    from talknet_segmentation_batchprocessing_spark.streaming.stateful import (
        _segment_batch,
    )

    b1 = pd.DataFrame(
        {"frame_idx": range(30), "score": [1.0 if f >= 10 else -1.0 for f in range(30)]}
    )
    b2 = pd.DataFrame(
        {
            "frame_idx": range(30, 60),
            "score": [1.0 if f < 40 else -1.0 for f in range(30, 60)],
        }
    )

    proc = SegmentProcessor(threshold=0.0, min_frames=12)
    proc.init(_FakeHandle())
    v2_out = []
    for b in (b1, b2):
        v2_out += [df for df in proc.handleInputRows(("v", 0), iter([b]), None)]

    class _FakeGroupState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    gs = _FakeGroupState()
    v1_out = []
    for b in (b1, b2):
        v1_out += list(_segment_batch(("v", 0), iter([b]), gs, 0.0, 12))

    v2 = pd.concat(v2_out).reset_index(drop=True)
    v1 = pd.concat(v1_out).reset_index(drop=True)
    pd.testing.assert_frame_equal(v1, v2)
    assert v2.iloc[0].tolist() == ["v", 0, 10, 40, 30]


@pytest.fixture()
def rocksdb_conf(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def _drain(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}").toPandas()


@needs_protobuf
def test_v2_run_spans_microbatches(spark, tmp_path, rocksdb_conf):
    """A speaking run crossing two micro-batch files must merge into
    ONE segment — state carries via the ValueState handle."""
    drop = tmp_path / "scores"
    drop.mkdir()
    b1 = [("v", 0, f, 1.0 if f >= 10 else -1.0) for f in range(30)]
    b2 = [("v", 0, f, 1.0 if f < 40 else -1.0) for f in range(30, 60)]
    spark.createDataFrame(b1, SCORES).coalesce(1).write.parquet(str(drop / "f1"))
    time.sleep(1.1)
    spark.createDataFrame(b2, SCORES).coalesce(1).write.parquet(str(drop / "f2"))

    stream = (
        spark.readStream.schema(SCORES)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(drop / "*"))
    )
    out = _drain(
        stateful_segments_v2(stream, threshold=0.0, min_duration_s=0.5),
        tmp_path,
        "segs_v2",
    )
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.start_frame, row.end_frame, row.n_frames) == (10, 40, 30)


@needs_protobuf
def test_v2_agrees_with_v1(spark, tmp_path, rocksdb_conf):
    """v1 (applyInPandasWithState) and v2 (transformWithStateInPandas)
    must produce identical segments on a multi-track input with
    sparse frames, duplicates, and a sub-minimum run."""
    from talknet_segmentation_batchprocessing_spark.streaming.stateful import (
        stateful_segments,
    )

    rows = (
        # sparse speaking run, span 19 (kept), closed by silence
        [("a", 0, f, 1.0) for f in range(10, 29, 2)]
        + [("a", 0, 29, -1.0)]
        # duplicate delivery of frame 12 (dropped)
        + [("a", 0, 12, 1.0)]
        # short run, span 3 < 12 (dropped)
        + [("b", 1, f, 1.0) for f in range(3)]
        + [("b", 1, 3, -1.0)]
        # run left open at end of stream (not emitted by either)
        + [("b", 2, f, 1.0) for f in range(50, 80)]
    )
    drop = tmp_path / "scores"
    drop.mkdir()
    spark.createDataFrame(rows, SCORES).coalesce(1).write.parquet(str(drop / "f1"))

    def run(op, name):
        stream = spark.readStream.schema(SCORES).parquet(str(drop / "*"))
        return (
            _drain(op(stream, threshold=0.0, min_duration_s=0.5), tmp_path, name)
            .sort_values(["video_id", "track_id", "start_frame"])
            .reset_index(drop=True)
        )

    v2 = run(stateful_segments_v2, "v2_cmp")
    v1 = run(stateful_segments, "v1_cmp")
    assert len(v1) == len(v2) == 1  # only the sparse 'a' run survives
    pd.testing.assert_frame_equal(v1, v2, check_dtype=False)
