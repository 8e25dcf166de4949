"""S13: dataset/model bootstrap — manifest-driven, idempotent,
distributed.

The reference bootstraps serially with shell commands: gdown the
pretrained model if absent (utils/tools.py:29-33), gdown + tar the
AVA csv bundle (tools.py:74-81), then a 6-hour SERIAL wget loop over
every movie file (tools.py:83-90), followed by extraction stages
(tools.py:64-72). This module re-expresses that as:

- a **manifest** of items (name, url, dest, optional sha256, optional
  post-step), so what-to-fetch is data, not shell strings;
- **copy-if-absent** semantics per item (tools.py:30's
  ``os.path.isfile == False`` check), so re-runs are no-ops;
- a **pluggable fetcher** callable ``(url, dest) -> None`` — network
  tooling (wget/gdown/boto) stays outside the engine and outside this
  test image; the default fetcher refuses with a clear error naming
  the item instead of silently shelling out;
- **distributed fetch**: the per-movie loop becomes ONE Spark job,
  each partition fetching its slice of the manifest — the 6-hour
  serial wall becomes max-over-executors. Results come back as a
  per-item (name, status) report, not driver-side mutation.

Checksum verification (sha256) is supported per item because a 100 TB
ingest that silently trusts a truncated download poisons everything
downstream.
"""

from __future__ import annotations

import hashlib
import os
import tarfile
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass


@dataclass(frozen=True)
class BootstrapItem:
    name: str
    url: str
    dest: str
    sha256: str | None = None
    extract_to: str | None = None  # untar dest into this dir after fetch


Fetcher = Callable[[str, str], None]


def _no_network_fetcher(url: str, dest: str) -> None:
    raise RuntimeError(
        f"no fetcher configured for {url!r} -> {dest!r}: pass "
        "fetcher=(url, dest) -> None wrapping your download tool "
        "(wget/gdown/boto3). The engine never shells out on its own."
    )


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _fetch_one(item: BootstrapItem, fetcher: Fetcher) -> tuple[str, str]:
    """Fetch a single item if absent; verify; run the post-step.
    Returns ``(name, status)`` with status in
    {"present", "fetched", "extracted"}; raises on checksum mismatch.

    Crash-safe: the fetcher writes to ``dest + '.part'``, checksum and
    tar extraction run against the temp file, and only THEN does an
    atomic ``os.replace`` publish ``dest`` — so an existing dest is a
    completed item by construction (a killed run leaves only a .part,
    which the retry overwrites), never a truncated download or an
    unextracted tarball. A present item with a declared sha256 is
    still re-verified (cheap one read) so a hand-copied or bit-rotted
    artifact cannot slip through as 'present'."""
    if os.path.exists(item.dest):
        if item.sha256 is not None:
            got = _sha256(item.dest)
            if got != item.sha256:
                raise ValueError(
                    f"{item.name}: existing {item.dest} fails sha256 "
                    f"(got {got[:12]}…, want {item.sha256[:12]}…); remove "
                    "it to refetch"
                )
        return item.name, "present"
    os.makedirs(os.path.dirname(item.dest) or ".", exist_ok=True)
    part = item.dest + ".part"
    fetcher(item.url, part)
    if item.sha256 is not None:
        got = _sha256(part)
        if got != item.sha256:
            os.remove(part)  # never leave a poisoned artifact
            raise ValueError(
                f"{item.name}: sha256 mismatch (got {got[:12]}…, "
                f"want {item.sha256[:12]}…); removed {part}"
            )
    status = "fetched"
    if item.extract_to is not None:
        os.makedirs(item.extract_to, exist_ok=True)
        with tarfile.open(part) as tf:
            tf.extractall(item.extract_to, filter="data")
        status = "extracted"
    os.replace(part, item.dest)  # publish LAST: dest == fully done
    return item.name, status


def bootstrap(
    items: Sequence[BootstrapItem], fetcher: Fetcher | None = None
) -> dict[str, str]:
    """Driver-side bootstrap for a handful of artifacts (model file,
    csv bundle). Idempotent: present items are skipped."""
    f = fetcher or _no_network_fetcher
    return dict(_fetch_one(it, f) for it in items)


def bootstrap_distributed(
    spark,
    items: Iterable[BootstrapItem],
    fetcher: Fetcher,
    slices: int | None = None,
) -> dict[str, str]:
    """The reference's serial per-movie wget loop (tools.py:83-90) as
    ONE Spark job: items are partitioned across executors, each
    partition fetches its slice (to shared storage — object store or
    NFS — in a real deployment), and statuses come back as the job
    result. Wall-clock = slowest slice, not the sum.

    ``fetcher`` must be serializable (top-level function / closure of
    picklable state) since it runs inside tasks.
    """
    item_list = list(items)
    if not item_list:
        return {}
    n = slices or min(len(item_list), spark.sparkContext.defaultParallelism)

    def run(part: Iterable[BootstrapItem]):
        for it in part:
            yield _fetch_one(it, fetcher)

    return dict(
        spark.sparkContext.parallelize(item_list, n).mapPartitions(run).collect()
    )


def ava_layout(data_path: str) -> list[str]:
    """The AVA directory skeleton the reference materializes
    (tools.py:35-66 comment block): returns the created dirs."""
    dirs = [
        os.path.join(data_path, d, s)
        for d, subs in (
            ("clips_audios", ("test", "train", "val")),
            ("clips_videos", ("test", "train", "val")),
            ("orig_audios", ("test", "trainval")),
            ("orig_videos", ("test", "trainval")),
        )
        for s in subs
    ] + [os.path.join(data_path, "csv")]
    for d in dirs:
        os.makedirs(d, exist_ok=True)
    return dirs


def ava_manifest(data_path: str, video_names: Sequence[tuple[str, str]] = ()) -> list[BootstrapItem]:
    """Manifest mirroring the reference's AVA bootstrap: the csv
    bundle (tools.py:74-81, extracted into ``csv/``), the pretrained
    model (tools.py:29-33), and one item per (split, filename) movie
    (tools.py:83-90's s3 URLs)."""
    items = [
        BootstrapItem(
            name="ava_csv_bundle",
            url="https://drive.google.com/uc?id=1C1cGxPHaJAl1NQ2i7IhRgWmdvsPhBCUy",
            dest=os.path.join(data_path, "csv.tar.gz"),
            extract_to=data_path,
        ),
        BootstrapItem(
            name="pretrain_AVA.model",
            url="https://drive.google.com/uc?id=1NVIkksrD3zbxbDuDbPc_846bLfPSZcZm",
            dest=os.path.join(data_path, "pretrain_AVA.model"),
        ),
    ]
    for split, fname in video_names:
        items.append(
            BootstrapItem(
                name=f"video:{split}/{fname}",
                url=f"https://s3.amazonaws.com/ava-dataset/{split}/{fname}",
                dest=os.path.join(data_path, "orig_videos", split, fname),
            )
        )
    return items
