"""Central query registry: merges every module's QUERIES/ORACLE catalog.

``__spark_entry__.py`` (the driver contract) delegates here. Every
operator claimed in SURVEY.md §2 must appear in ``all_queries()``; the
SQL-expressible ones must also appear in ``all_oracles()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from ..operators import (
        dedup,
        events,
        graph,
        multimodal,
        sampling,
        similarity,
        sketches,
        text,
    )
    from ..streaming import events as streaming_events
    from . import advanced, analytics, behavioral, etl_queries

    # Order matters: the round-1 driver recorded only the FIRST 50
    # registry entries, so the modules whose queries have never received
    # a driver verdict (similarity, multimodal, graph, sketches,
    # streaming, dedup tail) come first; the long-proven ETL/analytics
    # tail comes last.
    return (
        similarity,
        multimodal,
        graph,
        sketches,
        sampling,
        streaming_events,
        dedup,
        etl_queries,
        analytics,
        advanced,
        behavioral,
        events,
        text,
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in out:
                raise ValueError(f"Duplicate query name: {name}")
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        for name, sql in getattr(mod, "ORACLE", {}).items():
            if name in out:
                raise ValueError(f"Duplicate oracle name: {name}")
            out[name] = sql
    return out
