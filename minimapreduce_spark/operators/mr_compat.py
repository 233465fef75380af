"""Compat-layer queries: the reference apps run through ``run_job``.

These prove the MapReduce surface end-to-end against the same DuckDB
oracles as the DataFrame-native queries — the modern equivalent of
main/test-mr.sh's distributed-vs-sequential diff. The DataFrame-native
versions in operators/text.py are the fast path; these exist for parity
with the reference's UDF programming model (arbitrary Python mapf /
reducef), which is the slow path by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimapreduce_spark import mrapps
from minimapreduce_spark.catalog import load_table
from minimapreduce_spark.mapreduce import run_job
from minimapreduce_spark.registry import register


def _docs_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text) plays the reference's (filename, contents)."""
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


@register(
    "mr_wordcount",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (
      SELECT unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wc via the compat layer (mrapps/wc.go semantics, run_job engine)."""
    out = run_job(spark, _docs_source(spark, sf_dir), mrapps.wc_map, mrapps.wc_reduce, n_reduce=8)
    return out.select(F.col("key").alias("word"), F.col("value").cast("bigint").alias("cnt"))


@register(
    "mr_inverted_index",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS word
      FROM documents
    ),
    pairs AS (
      SELECT DISTINCT doc_id, word FROM words WHERE word <> ''
    )
    SELECT word,
           CAST(count(*) AS VARCHAR) || ' ' ||
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY CAST(doc_id AS VARCHAR))
             AS index_entry
    FROM pairs
    GROUP BY word
    """,
)
def mr_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """indexer via the compat layer — note the reference sorts doc names
    as STRINGS (mrapps/indexer.go:37), so the oracle orders by the varchar
    cast, unlike the numeric sort in the native inverted_index query."""
    out = run_job(
        spark, _docs_source(spark, sf_dir), mrapps.indexer_map, mrapps.indexer_reduce, n_reduce=8
    )
    return out.select(F.col("key").alias("word"), F.col("value").alias("index_entry"))
