"""Driver-facing query registry.

Each submodule defines ``QUERIES: dict[name, QuerySpec]`` pairing a
PySpark implementation with the equivalent ANSI SQL for the DuckDB
oracle (None for genuinely non-SQL-expressible ops -> the driver runs a
rows-only check). ``all_queries()`` merges them for __spark_entry__.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # DuckDB oracle; None => rows-only check


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def all_queries() -> dict[str, QuerySpec]:
    from fluent_server_spark.queries import docs, events, tpch, vectors

    merged: dict[str, QuerySpec] = {}
    for mod in (events, tpch, docs, vectors):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged
