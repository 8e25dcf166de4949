"""Sources & sinks (SURVEY.md §2.1): corpus scans, CSV IO, parquet
checkpoints, media ingest shells, segment sinks."""
