"""operators/multimodal.py decode bodies: the real cv2/PIL code paths
run against stub modules (neither lib is in this image — the same
pattern as tests/test_pyav_decoder.py), plus the guarded-import error.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from talknet_segmentation_batchprocessing_spark.operators.multimodal import (
    cv2_image_decoder,
    pil_image_decoder,
)


def test_cv2_body_with_stub_module(monkeypatch):
    calls = {}

    def imdecode(buf, flag):
        calls["buf"] = bytes(buf)
        calls["flag"] = flag
        return np.arange(6, dtype=np.int32).reshape(2, 3)  # non-uint8 on purpose

    cv2 = types.SimpleNamespace(imdecode=imdecode, IMREAD_GRAYSCALE=0)
    monkeypatch.setitem(sys.modules, "cv2", cv2)
    decode = cv2_image_decoder()
    out = decode(b"\x89PNGdata")
    assert calls["buf"] == b"\x89PNGdata"
    assert calls["flag"] == 0
    assert out.dtype == np.uint8 and out.shape == (2, 3)


def test_cv2_body_unparseable_bytes(monkeypatch):
    cv2 = types.SimpleNamespace(imdecode=lambda b, f: None, IMREAD_GRAYSCALE=0)
    monkeypatch.setitem(sys.modules, "cv2", cv2)
    with pytest.raises(ValueError, match="could not parse"):
        cv2_image_decoder()(b"junk")


def test_cv2_missing_raises_notimplemented(monkeypatch):
    monkeypatch.setitem(sys.modules, "cv2", None)  # import -> ImportError
    with pytest.raises(NotImplementedError, match="cv2 is not installed"):
        cv2_image_decoder()


class _StubPILImage:
    """Minimal PIL.Image.Image stand-in: context manager + convert +
    __array__ so np.asarray sees grayscale pixels."""

    def __init__(self, data):
        self._data = data
        self.converted_to = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def convert(self, mode):
        self.converted_to = mode
        return self

    def __array__(self, dtype=None, copy=None):
        a = self._data if dtype is None else self._data.astype(dtype)
        return np.array(a) if copy else a


def test_pil_body_with_stub_module(monkeypatch):
    img = _StubPILImage(np.full((3, 2), 7, dtype=np.uint8))
    opened = {}

    def open_fn(fp):
        opened["bytes"] = fp.read()
        return img

    pil_pkg = types.ModuleType("PIL")
    pil_pkg.Image = types.SimpleNamespace(open=open_fn)
    monkeypatch.setitem(sys.modules, "PIL", pil_pkg)
    decode = pil_image_decoder()
    out = decode(b"JFIFdata")
    assert opened["bytes"] == b"JFIFdata"
    assert img.converted_to == "L"
    assert out.dtype == np.uint8 and out.shape == (3, 2)
    assert (out == 7).all()


def test_pil_missing_raises_notimplemented(monkeypatch):
    monkeypatch.setitem(sys.modules, "PIL", None)
    with pytest.raises(NotImplementedError, match="Pillow is not installed"):
        pil_image_decoder()


def test_jpeg_decoder_real_bytes_no_stub():
    """The round-8 pure-numpy JPEG decoder is the one image decoder
    that runs on REAL bytes with no stub and no optional wheel."""
    from talknet_segmentation_batchprocessing_spark.operators.multimodal import (
        jpeg_image_decoder,
    )
    from talknet_segmentation_batchprocessing_spark.sources.jpeg import (
        encode_gray_jpeg,
    )

    y, x = np.mgrid[0:24, 0:32]
    img = ((x * 3 + y * 5) % 256).astype(np.uint8)
    out = jpeg_image_decoder()(encode_gray_jpeg(img, 92))
    assert out.dtype == np.uint8 and out.shape == (24, 32)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 8
    with pytest.raises(ValueError, match="SOI"):
        jpeg_image_decoder()(b"\x89PNGjunk")


def test_extract_image_features_real_jpeg_distributed(spark):
    """X4 (decode -> grayscale resize -> feature) on REAL image bytes
    through the Arrow-batched shell — no fake decoder anywhere."""
    from talknet_segmentation_batchprocessing_spark.operators.multimodal import (
        extract_image_features,
        jpeg_image_decoder,
    )
    from talknet_segmentation_batchprocessing_spark.sources.jpeg import (
        encode_gray_jpeg,
    )

    rng = np.random.RandomState(9)
    rows = []
    imgs = {}
    for i in range(6):
        base = ((np.mgrid[0:16, 0:16][0] * (i + 2)) % 256).astype(np.uint8)
        imgs[i] = base
        rows.append((i, bytearray(encode_gray_jpeg(base, 92))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = {
        r["doc_id"]: np.asarray(r["feature"])
        for r in extract_image_features(
            df, "payload", "doc_id", decoder=jpeg_image_decoder()
        ).collect()
    }
    assert set(feats) == set(imgs)
    dec = jpeg_image_decoder()
    for i, base in imgs.items():
        img = dec(bytes(encode_gray_jpeg(base, 92)))
        blocks = img.reshape(8, 2, 8, 2).mean(axis=(1, 3))
        want = (blocks.flatten() / 255.0).astype(np.float32)
        np.testing.assert_allclose(feats[i], want, rtol=0, atol=1e-7)
