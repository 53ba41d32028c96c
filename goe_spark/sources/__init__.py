"""Source/sink layer: how data enters and leaves the engine.

Mirrors the reference's transport surface (SURVEY.md §2.1) Spark-first:

- split_strategy: the scan-parallelization planner — choose how a JDBC
  table scan is split across executors (by partition, by hash-mod, by
  id-range / native range) and emit the exact ``spark.read`` options.
  Reference behavior: ``get_transport_split_type``
  (src/goe/offload/oracle/oracle_offload_transport_rdbms_api.py:537-634)
  and the generated PySpark JDBC options
  (src/goe/offload/offload_transport.py:1522-1809).
- jdbc: turn a SplitPlan into a DataFrameReader call.
- files: parquet/orc/json/csv table source behind the same interface
  (the driver's testdata path), staging write/read (S10-S12) and the
  cast-applied final sink (S13).
"""

from goe_spark.sources.files import FileSource, read_staging, write_staging
from goe_spark.sources.jdbc import jdbc_reader_options
from goe_spark.sources.split_strategy import (
    SplitPlan,
    choose_split_strategy,
    id_range_split,
    mod_split_predicates,
    native_range_split,
    partition_split_predicates,
)

__all__ = [
    "FileSource",
    "SplitPlan",
    "choose_split_strategy",
    "id_range_split",
    "jdbc_reader_options",
    "mod_split_predicates",
    "native_range_split",
    "partition_split_predicates",
    "read_staging",
    "write_staging",
]
