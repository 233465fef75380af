"""minimapreduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
MapReduce engine (TomKKlalala/MiniMapReduce, MIT 6.824 Lab 1, Go) as an
idiomatic Spark DataFrame/SQL engine, plus the relational and
LLM-data-pipeline operator surface the project's north star requires.

Design notes (100 TB posture):
- Everything is a declarative DataFrame plan: Catalyst does pushdown,
  pruning, join selection; AQE handles skew + partition coalescing.
- No ``collect()`` on data paths; dimension tables are broadcast; fact
  tables shuffle on their join/agg keys only.
- Python touches data only through Arrow-vectorized Pandas UDFs, and only
  where built-in functions cannot express the semantics.
"""

__version__ = "0.1.0"

from minimapreduce_spark.session import get_spark  # noqa: F401
from minimapreduce_spark.catalog import load_table, register_views  # noqa: F401
