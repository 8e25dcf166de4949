"""sources/bootstrap.py — S13 dataset bootstrap: idempotent manifest
fetch with a fake fetcher, checksum enforcement, tar post-extraction,
and the distributed per-movie fetch as one Spark job."""

from __future__ import annotations

import hashlib
import os
import tarfile

import pytest

from talknet_segmentation_batchprocessing_spark.sources.bootstrap import (
    BootstrapItem,
    ava_layout,
    ava_manifest,
    bootstrap,
    bootstrap_distributed,
)

_FETCH_LOG: list[str] = []


def _fake_fetcher(url: str, dest: str) -> None:
    _FETCH_LOG.append(url)
    with open(dest, "wb") as f:
        f.write(f"payload-of-{url}".encode())


def test_bootstrap_idempotent_and_reports(tmp_path):
    _FETCH_LOG.clear()
    items = [
        BootstrapItem("a", "u://a", str(tmp_path / "a.bin")),
        BootstrapItem("b", "u://b", str(tmp_path / "sub" / "b.bin")),
    ]
    r1 = bootstrap(items, _fake_fetcher)
    assert r1 == {"a": "fetched", "b": "fetched"}
    assert len(_FETCH_LOG) == 2
    r2 = bootstrap(items, _fake_fetcher)
    assert r2 == {"a": "present", "b": "present"}
    assert len(_FETCH_LOG) == 2  # copy-if-absent: no refetch


def test_bootstrap_checksum_rejects_and_removes(tmp_path):
    good = hashlib.sha256(b"payload-of-u://c").hexdigest()
    ok = bootstrap(
        [BootstrapItem("c", "u://c", str(tmp_path / "c.bin"), sha256=good)],
        _fake_fetcher,
    )
    assert ok == {"c": "fetched"}
    with pytest.raises(ValueError, match="sha256 mismatch"):
        bootstrap(
            [BootstrapItem("d", "u://d", str(tmp_path / "d.bin"), sha256="0" * 64)],
            _fake_fetcher,
        )
    assert not os.path.exists(tmp_path / "d.bin")  # poisoned artifact removed


def test_bootstrap_extracts_tarball(tmp_path):
    src = tmp_path / "content"
    src.mkdir()
    (src / "x.csv").write_text("1,2,3")
    tar_path = tmp_path / "bundle.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        tf.add(src / "x.csv", arcname="csv/x.csv")

    def tar_fetcher(url, dest):
        os.replace(tar_path, dest)

    out = bootstrap(
        [
            BootstrapItem(
                "bundle",
                "u://bundle",
                str(tmp_path / "dl" / "bundle.tar.gz"),
                extract_to=str(tmp_path / "data"),
            )
        ],
        tar_fetcher,
    )
    assert out == {"bundle": "extracted"}
    assert (tmp_path / "data" / "csv" / "x.csv").read_text() == "1,2,3"


def test_distributed_fetch_one_spark_job(spark, tmp_path):
    dest_root = str(tmp_path / "movies")
    items = [
        BootstrapItem(f"v{i}", f"u://v{i}", os.path.join(dest_root, f"v{i}.mp4"))
        for i in range(12)
    ]
    out = bootstrap_distributed(spark, items, _fake_fetcher, slices=4)
    assert out == {f"v{i}": "fetched" for i in range(12)}
    assert sorted(os.listdir(dest_root)) == sorted(f"v{i}.mp4" for i in range(12))
    # idempotent at the distributed level too
    again = bootstrap_distributed(spark, items, _fake_fetcher, slices=4)
    assert again == {f"v{i}": "present" for i in range(12)}


def test_ava_manifest_and_layout(tmp_path):
    root = str(tmp_path / "AVA")
    dirs = ava_layout(root)
    assert all(os.path.isdir(d) for d in dirs)
    items = ava_manifest(root, video_names=[("trainval", "m1.mkv"), ("test", "m2.mkv")])
    names = [i.name for i in items]
    assert names[0] == "ava_csv_bundle" and names[1] == "pretrain_AVA.model"
    assert "video:trainval/m1.mkv" in names and "video:test/m2.mkv" in names
    v = next(i for i in items if i.name == "video:trainval/m1.mkv")
    assert v.url.endswith("/trainval/m1.mkv") and "orig_videos" in v.dest


def test_default_fetcher_refuses_clearly(tmp_path):
    with pytest.raises(RuntimeError, match="no fetcher configured"):
        bootstrap([BootstrapItem("x", "u://x", str(tmp_path / "x"))])


def test_partial_download_is_refetched_and_present_is_reverified(tmp_path):
    """Crash-safety (round-4 review find): a leftover .part from a
    killed run must be refetched (dest only appears after verification
    + extraction), and a present dest failing its declared sha256 must
    raise instead of being trusted."""
    dest = str(tmp_path / "model.bin")
    good = hashlib.sha256(b"payload-of-u://m").hexdigest()
    # simulate a crashed prior run: partial temp file, no dest
    with open(dest + ".part", "wb") as f:
        f.write(b"trunca")
    out = bootstrap([BootstrapItem("m", "u://m", dest, sha256=good)], _fake_fetcher)
    assert out == {"m": "fetched"}
    assert not os.path.exists(dest + ".part")
    assert open(dest, "rb").read() == b"payload-of-u://m"
    # corrupt the published artifact -> present-path verification trips
    with open(dest, "wb") as f:
        f.write(b"bitrot")
    with pytest.raises(ValueError, match="fails sha256"):
        bootstrap([BootstrapItem("m", "u://m", dest, sha256=good)], _fake_fetcher)
