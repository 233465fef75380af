"""Multimodal-column plumbing (north-star surface).

Treats media as opaque ``binary`` columns with typed metadata structs,
processed by Arrow-batched ``mapInPandas`` operators — the pattern for
decode / feature-extract / resize / frame-sample stages at 100 TB
(bytes never leave the executor; Python sees pandas batches via Arrow).

The container has no image/audio libraries, so the real decoders are
stubbed behind ``NotImplementedError`` (clearly marked); the pipeline
itself — schema, batching, partitioning, UDF signatures — is real and
oracle-checked: ``multimodal_features`` derives its features from the
binary payload deterministically, so plain SQL over the source text can
verify the Spark-side byte plumbing end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimapreduce_spark.catalog import load_table
from minimapreduce_spark.registry import register

FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, first_byte bigint, byte_checksum bigint"


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct): the canonical
    multimodal layout. payload = utf-8 bytes of the text (stand-in for
    image/audio bytes); meta carries the typed sidecar a real ingest
    would parse from headers."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length("text").cast("bigint").alias("n_chars"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """STUB — real decoder needs PIL/libjpeg, absent from this
    container. The mapInPandas stage below is the real plumbing; swap
    this function for the genuine decode on a cluster with codecs."""
    raise NotImplementedError(
        "image decode requires PIL/pillow (not installed); "
        "use extract_features' deterministic byte features instead"
    )


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: per Arrow batch, compute deterministic
    byte-level features (length, first byte, additive checksum mod
    1e9+7). Shape-identical to a real decode+featurize stage."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                "byte_checksum": payloads.map(lambda b: sum(b) % 1000000007),
            }
        )


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT)              AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
           CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c)))
                % 1000000007 AS BIGINT)              AS byte_checksum
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via Arrow-batched mapInPandas.
    The corpus is ASCII, so byte length == char length and the byte
    checksum equals the char-code sum — which is what lets plain SQL
    oracle-check a binary-payload pipeline."""
    from minimapreduce_spark._pickle import register_self_by_value

    register_self_by_value()
    return binary_table(spark, sf_dir).mapInPandas(extract_features, schema=FEATURE_SCHEMA)
