"""goe_spark — a PySpark-native analytics/offload engine.

A ground-up rebuild of the capabilities of gluent/goe (batch ETL
offload orchestration: typed schema mapping, predicate DSL, partition
bookkeeping, staged loads, cross-system validation) re-expressed as
idiomatic Spark DataFrame / SQL plans, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Subpackages
-----------
- ``types``      canonical type system + frontend/backend mappings
- ``predicate``  the GOE offload-predicate DSL -> pyspark Column / SQL
- ``sources``    JDBC split-strategy readers + file sources
- ``functions``  cross-engine hashing, synthetic partition expressions,
                 cast maps, column transforms, text functions
- ``operators``  validation algebra, dedup, similarity, multimodal
- ``plans``      incremental partition selection, chunking, metadata
- ``streaming``  structured-streaming operators over the events table
"""

__version__ = "0.1.0"
