from goe_spark.sinks.backend_writer import (
    BackendWriter,
    FakeWarehouseWriter,
    ParquetBackendWriter,
)

__all__ = ["BackendWriter", "FakeWarehouseWriter", "ParquetBackendWriter"]
