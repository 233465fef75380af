"""Source/sink layer: every format the engine reads or writes.

The reference reads exactly one format — whole text files, one file per
map split (mr/master.go:327-338, mr/worker.go:59-67) — and writes one:
'key value' lines (mr/worker.go:159-174). This package keeps that
surface (``whole_text_files``, plus mapreduce.write_text_output for the
line sink) and generalizes to the columnar formats a 100 TB pipeline
actually uses, with schemas carried explicitly.

Format guidance at scale: parquet for data paths (column pruning +
predicate pushdown + row-group skipping); csv/json only at ingest
edges — they are row-oriented, schema-less, and unsplittable when
compressed with gzip.
"""

from minimapreduce_spark.sources.formats import (  # noqa: F401
    read_source,
    whole_text_files,
    write_sink,
)
