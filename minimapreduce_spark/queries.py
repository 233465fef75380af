"""Aggregates all operator modules into the engine's query surface.

Importing this module imports every operator module, which registers
its queries into :mod:`minimapreduce_spark.registry`.
"""

from __future__ import annotations

import importlib

_OPERATOR_MODULES = [
    "minimapreduce_spark.operators.text",
    "minimapreduce_spark.operators.mr_compat",
    "minimapreduce_spark.operators.relational",
    "minimapreduce_spark.operators.tpch_more",
    "minimapreduce_spark.operators.tpch_rest",
    "minimapreduce_spark.operators.events",
    "minimapreduce_spark.operators.analytics",
    "minimapreduce_spark.operators.text_analysis",
    "minimapreduce_spark.operators.dedup",
    "minimapreduce_spark.operators.similarity",
    "minimapreduce_spark.operators.multimodal",
    "minimapreduce_spark.operators.scale",
    "minimapreduce_spark.operators.pipeline",
    "minimapreduce_spark.operators.semantics",
    "minimapreduce_spark.operators.graph",
    "minimapreduce_spark.streaming.windows",
    "minimapreduce_spark.streaming.dedup_join",
    "minimapreduce_spark.streaming.stateful",
    "minimapreduce_spark.streaming.upsert",
    "minimapreduce_spark.streaming.drift",
    "minimapreduce_spark.streaming.sketch",
    "minimapreduce_spark.functions.udfs",
    "minimapreduce_spark.sources.pydatasource",
]

for _m in _OPERATOR_MODULES:
    importlib.import_module(_m)

# Worker-side closures (RDD compat layer, pandas UDFs) must not require
# executors to import this package — see _pickle.py.
from minimapreduce_spark._pickle import register_self_by_value as _rsbv  # noqa: E402

_rsbv()

from minimapreduce_spark.registry import (  # noqa: E402,F401
    REGISTRY,
    bench_queries,
    oracles,
    queries,
)
