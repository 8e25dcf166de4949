"""Tests for the real PyAV decoder body (sources/media_ingest.py:pyav_decoder).

The ``av`` package is not in this image, so these tests inject a minimal
stub module exposing exactly the API surface the decoder uses
(open/streams/decode/AudioResampler). This executes the REAL resampling
and CFR-grid logic; only the codec bindings are faked. The import-guard
path (no ``av`` at all) is tested separately.

Reference semantics under test: ffmpeg ``-r 25`` CFR transcode +
grayscale (demoTalkNet.py:489-493), 16 kHz mono s16 audio
(demoTalkNet.py:497-502).
"""

from __future__ import annotations

import sys
import types
from fractions import Fraction

import numpy as np
import pytest


class FakeVideoFrame:
    def __init__(self, pts, img):
        self.pts = pts
        self._img = img

    def to_ndarray(self, format):
        assert format == "gray"
        return self._img


class FakeAudioFrame:
    def __init__(self, arr):
        self._arr = arr  # (1, n) float or int

    def to_ndarray(self):
        return self._arr


class FakeResampler:
    """Passthrough resampler: emits each frame's payload as s16 mono.
    Holds back the final frame until flush to prove the flush path runs."""

    def __init__(self, format, layout, rate):
        assert (format, layout) == ("s16", "mono")
        self.rate = rate
        self._held = None

    def resample(self, frame):
        if frame is None:  # flush
            out = [self._held] if self._held is not None else []
            self._held = None
            return out
        prev, self._held = self._held, frame
        return [prev] if prev is not None else []


class FakeStream:
    def __init__(self, time_base):
        self.time_base = time_base
        self.thread_type = None


class FakeStreams:
    def __init__(self, video, audio):
        self.video = video
        self.audio = audio


class FakeContainer:
    def __init__(self, vframes, aframes, time_base):
        self._vframes = vframes
        self._aframes = aframes
        self._vstream = FakeStream(time_base)
        self._astream = FakeStream(Fraction(1, 16000))
        self.streams = FakeStreams(
            [self._vstream] if vframes is not None else [],
            [self._astream] if aframes is not None else [],
        )

    def decode(self, stream):
        yield from (self._vframes if stream is self._vstream else self._aframes)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


@pytest.fixture
def stub_av(monkeypatch):
    """Install a stub ``av`` module; yields a dict the test fills with
    the frames the next ``av.open`` should produce."""
    cfg = {"vframes": [], "aframes": [], "time_base": Fraction(1, 1000)}
    av = types.ModuleType("av")
    av.open = lambda fobj: FakeContainer(
        cfg["vframes"], cfg["aframes"], cfg["time_base"]
    )
    av.AudioResampler = FakeResampler
    monkeypatch.setitem(sys.modules, "av", av)
    return cfg


def _mkdecoder():
    from talknet_segmentation_batchprocessing_spark.sources.media_ingest import (
        pyav_decoder,
    )

    return pyav_decoder()


def test_import_guard_without_av(monkeypatch):
    from talknet_segmentation_batchprocessing_spark.sources import media_ingest

    monkeypatch.setitem(sys.modules, "av", None)  # import av -> ImportError
    with pytest.raises(NotImplementedError, match="PyAV is not installed"):
        media_ingest.pyav_decoder()


def test_requires_content_bytes(stub_av):
    dec = _mkdecoder()
    with pytest.raises(ValueError, match="content"):
        dec("vidA", None)


def test_cfr_grid_duplicates_slow_source(stub_av):
    # 12.5 fps source (one frame every 80 ms): the 25 fps grid must
    # emit each source frame twice (nearest-pts CFR, like ffmpeg -r 25)
    imgs = [np.full((4, 6), i, dtype=np.uint8) for i in range(5)]
    stub_av["vframes"] = [FakeVideoFrame(i * 80, img) for i, img in enumerate(imgs)]
    frames, h, w, samples = _mkdecoder()("vidA", b"x")
    assert (h, w) == (4, 6)
    # span 0..320ms at 25 fps -> 9 grid ticks
    assert len(frames) == 9
    got = [np.frombuffer(f, dtype=np.uint8)[0] for f in frames]
    # ticks at 0,40,80,...: 40ms is equidistant (0 vs 80) -> earlier wins
    assert got == [0, 0, 1, 1, 2, 2, 3, 3, 4]
    assert samples.size == 0  # no audio stream content


def test_cfr_grid_drops_fast_source(stub_av):
    # 50 fps source: every other frame dropped
    imgs = [np.full((2, 2), i, dtype=np.uint8) for i in range(9)]
    stub_av["vframes"] = [FakeVideoFrame(i * 20, img) for i, img in enumerate(imgs)]
    frames, _, _, _ = _mkdecoder()("vidA", b"x")
    got = [np.frombuffer(f, dtype=np.uint8)[0] for f in frames]
    assert got == [0, 2, 4, 6, 8]


def test_unordered_pts_and_none_pts_handled(stub_av):
    imgs = [np.full((2, 2), i, dtype=np.uint8) for i in range(3)]
    stub_av["vframes"] = [
        FakeVideoFrame(80, imgs[2]),
        FakeVideoFrame(None, imgs[0]),  # skipped
        FakeVideoFrame(0, imgs[0]),
        FakeVideoFrame(40, imgs[1]),
    ]
    frames, _, _, _ = _mkdecoder()("vidA", b"x")
    got = [np.frombuffer(f, dtype=np.uint8)[0] for f in frames]
    assert got == [0, 1, 2]


def test_audio_concat_and_flush(stub_av):
    a = np.arange(10, dtype=np.int16).reshape(1, -1)
    b = (np.arange(6, dtype=np.int16) + 100).reshape(1, -1)
    stub_av["aframes"] = [FakeAudioFrame(a), FakeAudioFrame(b)]
    frames, h, w, samples = _mkdecoder()("vidA", b"x")
    assert frames == [] and (h, w) == (0, 0)
    # the resampler holds the last frame until flush — both must appear
    np.testing.assert_array_equal(samples, np.concatenate([a.ravel(), b.ravel()]))
    assert samples.dtype == np.int16


def test_video_and_audio_together(stub_av):
    stub_av["vframes"] = [
        FakeVideoFrame(i * 40, np.full((3, 3), i, dtype=np.uint8)) for i in range(4)
    ]
    stub_av["aframes"] = [
        FakeAudioFrame(np.ones((1, 16), dtype=np.int16)) for _ in range(3)
    ]
    frames, h, w, samples = _mkdecoder()("vidA", b"x")
    assert len(frames) == 4 and (h, w) == (3, 3)
    assert samples.size == 48
