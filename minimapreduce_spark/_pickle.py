"""Make worker-side closures self-contained.

Spark pickles functions defined in importable modules *by reference*,
so executors must be able to ``import minimapreduce_spark`` — true in
our tests (cwd = repo root) but not when a foreign driver imports
``__spark_entry__`` from elsewhere, and not on a cluster where the repo
isn't shipped. Registering our modules for cloudpickle
pickle-by-value embeds the function bodies in the task closure instead,
so the package never needs to exist on executors. (The DataFrame-only
operators are unaffected — they ship no Python to workers at all.)
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle


def register_self_by_value() -> None:
    """Idempotent: register every loaded minimapreduce_spark module."""
    for name, mod in list(sys.modules.items()):
        if name.startswith("minimapreduce_spark") and mod is not None:
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass  # e.g. namespace pkg oddities; by-reference still works locally
