"""Python UDTF surface (SURVEY §2.10): SQL-visible table functions.

The engine's hot paths are built-in expressions (the repo-wide rule:
no Python in the row path), but the UDF/UDTF registration surface is
part of the API a Spark platform exposes — the reference registers
custom partition functions as UDFs the same way. This module
registers one genuinely table-valued function:

  doc_chunks(text, chunk, stride) ->
      rows (chunk_idx INT, chunk_text STRING)

the lateral-join form of sliding-window chunking:

  SELECT d.doc_id, c.chunk_idx, c.chunk_text
  FROM documents d, LATERAL doc_chunks(d.text, 32, 24) c

Honesty note on scale: a Python UDTF moves every row through a Python
worker — the 100 TB chunk-ACCOUNTING path is the pure-expression twin
(queries/training.sliding_window_chunks), and the chunk-TEXT path at
scale is a slice()/sequence() expression. The UDTF earns its place as
the ergonomic SQL surface and is pinned against the expression
formula (tests/test_udtf.py) so the two can never drift.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk_text string")
class DocChunks:
    """Overlapping token windows of ``chunk`` tokens advanced by
    ``stride`` — 1 window when n <= chunk, else
    ceil((n - chunk) / stride) + 1, matching
    queries/training.sliding_window_chunks exactly."""

    def eval(self, text: str, chunk: int, stride: int):
        if text is None:
            return
        if chunk <= 0 or stride <= 0:
            raise ValueError("chunk and stride must be positive")
        toks = text.split()
        n = len(toks)
        if n == 0:
            return
        i = 0
        idx = 0
        while True:
            yield idx, " ".join(toks[i : i + chunk])
            if i + chunk >= n:
                return
            i += stride
            idx += 1


def register_udtfs(spark: SparkSession) -> None:
    """Register every UDTF for spark.sql access."""
    spark.udtf.register("doc_chunks", DocChunks)
