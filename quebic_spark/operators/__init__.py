"""Operator registry: every implemented query with its DuckDB oracle.

``QUERIES`` maps name -> (spark, sf_dir) -> DataFrame.
``ORACLES`` maps name -> ANSI SQL for DuckDB (absent => rows-only check).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from quebic_spark.operators import (
    dedup,
    events,
    multimodal,
    queueops,
    relational,
    sampling,
    similarity,
    temporal,
    textops,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _mod in (relational, dedup, similarity, textops, events, multimodal,
             queueops, temporal, sampling):
    QUERIES.update(_mod.QUERIES)
    ORACLES.update(_mod.ORACLES)
