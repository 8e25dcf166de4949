"""S2: custom Python DataSource (Spark 4 DataSource API) for a video
corpus — the idiomatic replacement for the reference's driver-side
streaming-dataset iterator (batchProcessVideos.py:111-124).

One InputPartition per video file: listing happens once at planning,
payload reads happen executor-side in parallel, and the source
composes with the whole DataFrame surface:

    spark.dataSource.register(VideoCorpusDataSource)
    df = (spark.read.format("video_corpus")
          .option("path", folder).option("with_content", "true").load())
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

VIDEO_EXTENSIONS = ("mp4", "avi", "mov", "mkv")

_SCHEMA = "video_id string, path string, ext string, byte_len long, content binary"
_META_SCHEMA = "video_id string, path string, ext string, byte_len long"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class VideoCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.folder = options.get("path")
        if not self.folder:
            raise ValueError("video_corpus requires .option('path', <folder>)")
        exts = options.get("extensions", ",".join(VIDEO_EXTENSIONS)).split(",")
        self.exts = tuple(e.strip().lower() for e in exts if e.strip())
        self.with_content = str(options.get("with_content", "false")).lower() == "true"

    def partitions(self):
        paths = sorted(
            p
            for p in glob.glob(os.path.join(self.folder, "*"))
            if os.path.isfile(p)
            and p.rsplit(".", 1)[-1].lower() in self.exts
        )
        return [_FilePartition(p) for p in paths]

    def read(self, partition: _FilePartition):
        path = partition.path
        name = os.path.basename(path)
        video_id, _, ext = name.rpartition(".")
        size = os.path.getsize(path)
        if self.with_content:
            with open(path, "rb") as f:
                yield (video_id, path, ext.lower(), size, f.read())
        else:
            yield (video_id, path, ext.lower(), size)


class VideoCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "video_corpus"

    def schema(self) -> str:
        with_content = str(self.options.get("with_content", "false")).lower() == "true"
        return _SCHEMA if with_content else _META_SCHEMA

    def reader(self, schema) -> VideoCorpusReader:
        return VideoCorpusReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(VideoCorpusDataSource)
