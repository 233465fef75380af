"""Aggregates all operator modules into the engine's query surface.

Importing this module imports every operator module, which registers
its queries into :mod:`minimapreduce_spark.registry`.
"""

from __future__ import annotations

import importlib

_OPERATOR_MODULES = [
    "minimapreduce_spark.operators.text",
]

for _m in _OPERATOR_MODULES:
    importlib.import_module(_m)

from minimapreduce_spark.registry import (  # noqa: E402,F401
    REGISTRY,
    bench_queries,
    oracles,
    queries,
)
