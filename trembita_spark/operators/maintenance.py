"""Table-maintenance operators: compaction and pruning-friendly layout.

The small-files problem is the perennial 100 TB sink pathology: a
streaming or over-parallel writer leaves thousands of KB-scale files,
and every later scan pays per-file open/footer costs. Compaction
rewrites a table into few large files; sorting within the rewrite gives
each file a tight min/max range on the sort key, so parquet row-group /
file skipping prunes later range scans (the Z-order-lite layout every
lakehouse maintenance job applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_files: int = 4,
    sort_by: str | None = None,
) -> DataFrame:
    """Rewrite ``src_path`` into ``target_files`` parquet files at
    ``dst_path``; with ``sort_by``, range-partition + sort so files have
    disjoint min/max on that column (verified via parquet footers in
    tests). Returns the compacted DataFrame handle.

    Content is bit-identical to the source — compaction is layout-only.
    At 100 TB: run per partition-directory, size target_files from
    bytes/128MB-1GB, and prefer the partition key's natural time order
    as sort_by so retention deletes stay directory-aligned."""
    df = spark.read.parquet(src_path)
    if sort_by is not None:
        out = df.repartitionByRange(target_files, F.col(sort_by)).sortWithinPartitions(
            sort_by
        )
    else:
        out = df.repartition(target_files)
    out.write.mode("overwrite").parquet(dst_path)
    return spark.read.parquet(dst_path)
