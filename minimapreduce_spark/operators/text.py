"""Text operators: the reference's shipped applications, Spark-first.

The reference's entire query library is four MapReduce "apps"
(SURVEY §2b): wc (mrapps/wc.go:21-44), indexer (mrapps/indexer.go:20-39),
crash/nocrash metadata agg (mrapps/crash.go:34-55), and timing probes.
Here each is a declarative DataFrame plan over the ``documents`` table —
scan → explode → shuffle-on-key → aggregate — which Catalyst compiles to
a partial+final hash aggregate (the map-side combiner the reference
lacks, SURVEY §4 "No combiner").

Tokenization contract: split on non-letters, case-sensitive, drop empty
tokens — exactly mrapps/wc.go:23-26 (`unicode.IsLetter` splitter).

Determinism contract: the reference's reduce sees values in
non-deterministic order, so well-behaved apps sort inside the UDF
(mrapps/indexer.go:37, mrapps/crash.go:48-51). We expose the same fix:
``array_sort(collect_list(...))`` before joining — never a bare
``collect_list``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimapreduce_spark.catalog import fan_out, load_table
from minimapreduce_spark.registry import register

WORD_SPLIT = r"[^A-Za-z]+"


def words_df(spark: SparkSession, sf_dir: str, with_doc: bool = False) -> DataFrame:
    """documents.text → one row per token (reference map-phase of wc)."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    cols = (["doc_id"] if with_doc else []) + [
        F.explode(F.split(F.col("text"), WORD_SPLIT)).alias("word")
    ]
    return docs.select(*cols).where(F.col("word") != "")


@register(
    "wordcount",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (
      SELECT unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
    bench=True,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count — mrapps/wc.go:21-44. scan→flatMap→shuffle→agg, the
    entire reference capability in one query."""
    return words_df(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))


@register(
    "inverted_index",
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
           count(*) AS n_docs,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_list
    FROM pairs
    GROUP BY word
    """,
    bench=True,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index — mrapps/indexer.go:20-39: per-doc distinct words
    (the Go set at :21-26), then per-word doc count + sorted doc list
    (:37-38). doc list sorted numerically then comma-joined."""
    pairs = words_df(spark, sf_dir, with_doc=True).distinct()
    return pairs.groupBy("word").agg(
        F.count("*").alias("n_docs"),
        F.concat_ws(
            ",",
            F.transform(F.array_sort(F.collect_set("doc_id")), lambda x: x.cast("string")),
        ).alias("doc_list"),
    )


@register(
    "crash_agg",
    oracle="""
    WITH kv AS (
      SELECT 'a' AS key, CAST(doc_id AS VARCHAR) AS value FROM documents
      UNION ALL
      SELECT 'b', CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'c', CAST(n_chars AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'd', 'xyzzy' FROM documents
    )
    SELECT key, string_agg(value, ' ' ORDER BY value) AS agg_value
    FROM kv
    GROUP BY key
    """,
)
def crash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata aggregation — mrapps/crash.go:34-55: map emits four fixed
    keys (a→name, b→len(name), c→len(contents), d→'xyzzy'); reduce is the
    sorted space-join (:48-53). documents(doc_id, n_chars) plays
    (filename, len(contents)). The crash-injection half of the app tests
    engine retry, which is Spark config (SURVEY §2a#10), not a query."""
    docs = load_table(spark, sf_dir, "documents")
    doc_id_str = F.col("doc_id").cast("string")
    kv = docs.select(
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("key"), doc_id_str.alias("value")),
                F.struct(F.lit("b").alias("key"), F.length(doc_id_str).cast("string").alias("value")),
                F.struct(F.lit("c").alias("key"), F.col("n_chars").cast("string").alias("value")),
                F.struct(F.lit("d").alias("key"), F.lit("xyzzy").alias("value")),
            )
        ).alias("kv")
    ).select("kv.key", "kv.value")
    return kv.groupBy("key").agg(
        F.concat_ws(" ", F.array_sort(F.collect_list("value"))).alias("agg_value")
    )


@register(
    "distinct_words_per_doc",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS word
      FROM documents
    )
    SELECT doc_id,
           count(DISTINCT word) AS n_distinct,
           count(*) AS n_tokens
    FROM words
    WHERE word <> ''
    GROUP BY doc_id
    """,
)
def distinct_words_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document distinct-word + token counts — the indexer's map-side
    dedup (mrapps/indexer.go:21-26) surfaced as a first-class query."""
    return (
        words_df(spark, sf_dir, with_doc=True)
        .groupBy("doc_id")
        .agg(
            F.count_distinct("word").alias("n_distinct"),
            F.count("*").alias("n_tokens"),
        )
    )
