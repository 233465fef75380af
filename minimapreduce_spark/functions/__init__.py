"""User-function surface of the engine (SURVEY §2c "UDF/UDAF/UDTF").

The reference's entire extensibility story is the Go-plugin Map/Reduce
pair (main/mrworker.go:36-55); the RDD-faithful port of that contract
lives in minimapreduce_spark.mapreduce. This package is the
DataFrame-native generalization:

- ``udfs``    — vectorized scalar pandas UDF, GROUPED_AGG pandas UDAF,
                and a Python UDTF, each oracle-checked.
- ``vector``  — re-exported JVM-side vector expression builders
                (dot/norm/cosine) used by the similarity operators.

Rule of thumb encoded here: built-ins first (codegen'd, JVM-side);
when Python is genuinely needed, Arrow-batched pandas UDFs — never
row-at-a-time ``udf()`` in a hot path.
"""

from minimapreduce_spark.operators.similarity import cosine, dot, norm  # noqa: F401
