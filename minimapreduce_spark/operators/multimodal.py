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


RESIZE_SCHEMA = "doc_id bigint, n_bytes_out bigint, checksum_out bigint"
RESIZE_STRIDE = 2

FRAME_BYTES = 64
FRAME_STRIDE = 4
FRAME_SCHEMA = "doc_id bigint, frame_index bigint, frame_bytes bigint, frame_checksum bigint"


def resize_stride(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas 'resize' stage: stride-2 byte downsample — the
    deterministic stand-in for an image resize kernel (swap the body
    for PIL `Image.resize` on a cluster with codecs; the batch shape,
    schema, and partitioning stay identical)."""
    mod = 1000000007
    for pdf in batches:
        resized = pdf["payload"].map(lambda b: b[::RESIZE_STRIDE])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes_out": resized.map(len),
                "checksum_out": resized.map(lambda b: sum(b) % mod),
            }
        )


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas frame-sample stage: treat the payload as a video of
    FRAME_BYTES-sized frames, keep every FRAME_STRIDE-th full frame —
    one OUTPUT ROW PER SAMPLED FRAME (rows-out > rows-in, the UDTF-like
    mapInPandas shape). Real video would swap the slicing for a
    pyav/ffmpeg keyframe read; partitioning and schema are unchanged."""
    mod = 1000000007
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_index": [], "frame_bytes": [], "frame_checksum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // FRAME_BYTES
            for fi in range(0, n_frames, FRAME_STRIDE):
                frame = payload[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_index"].append(fi)
                out["frame_bytes"].append(len(frame))
                out["frame_checksum"].append(sum(frame) % mod)
        yield pd.DataFrame(out)


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST((length(text) + 1) // 2 AS BIGINT) AS n_bytes_out,
           CAST(list_sum(list_transform(generate_series(1, length(text), 2),
                i -> ascii(substr(text, i, 1)))) % 1000000007 AS BIGINT) AS checksum_out
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage over binary payloads via Arrow-batched mapInPandas;
    the stride downsample is byte-for-byte reproducible in SQL, which
    oracle-checks the plumbing (batching, slicing, schema)."""
    from minimapreduce_spark._pickle import register_self_by_value

    register_self_by_value()
    return binary_table(spark, sf_dir).mapInPandas(resize_stride, schema=RESIZE_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text, length(text) // {FRAME_BYTES} AS n_frames
      FROM documents
    ),
    fi AS (
      SELECT doc_id, text,
             unnest(generate_series(0, n_frames - 1, {FRAME_STRIDE})) AS frame_index
      FROM f WHERE n_frames > 0
    )
    SELECT doc_id,
           CAST(frame_index AS BIGINT) AS frame_index,
           CAST({FRAME_BYTES} AS BIGINT) AS frame_bytes,
           CAST(list_sum(list_transform(
                string_split(substr(text, frame_index * {FRAME_BYTES} + 1, {FRAME_BYTES}), ''),
                c -> ascii(c))) % 1000000007 AS BIGINT) AS frame_checksum
    FROM fi
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: every 4th 64-byte frame,
    one row per sampled frame — mapInPandas producing more rows than it
    consumes, the shape a real video frame-extractor has."""
    from minimapreduce_spark._pickle import register_self_by_value

    register_self_by_value()
    return binary_table(spark, sf_dir).mapInPandas(sample_frames, schema=FRAME_SCHEMA)


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


AUDIO_WINDOW = 256
AUDIO_SCHEMA = "doc_id bigint, window_id bigint, n_samples bigint, energy bigint, peak bigint"


def audio_windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas audio-analysis stage: treat the payload as 8-bit PCM
    and emit fixed-size analysis windows (RMS-style energy + peak per
    window) — the windowing/batching shape a real loudness or VAD
    kernel has; swap the arithmetic for librosa/torchaudio where
    installed. Pure integer math, so the oracle reproduces it exactly."""
    import numpy as np

    for pdf in batches:
        out = {"doc_id": [], "window_id": [], "n_samples": [], "energy": [], "peak": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            for w, start in enumerate(range(0, len(arr), AUDIO_WINDOW)):
                win = arr[start : start + AUDIO_WINDOW]
                out["doc_id"].append(doc_id)
                out["window_id"].append(w)
                out["n_samples"].append(len(win))
                out["energy"].append(int((win * win).sum()))
                out["peak"].append(int(win.max()))
        yield pd.DataFrame(out)


@register(
    "multimodal_audio_windows",
    oracle=f"""
    WITH wins AS (
      SELECT doc_id, text,
             unnest(generate_series(1, length(text), {AUDIO_WINDOW})) AS start
      FROM documents
    )
    SELECT doc_id,
           CAST((start - 1) / {AUDIO_WINDOW} AS BIGINT) AS window_id,
           CAST(least({AUDIO_WINDOW}, length(text) - start + 1) AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(
                  generate_series(start, least(start + {AUDIO_WINDOW} - 1, length(text))),
                  i -> ascii(substr(text, i, 1)) * ascii(substr(text, i, 1))))
                AS BIGINT) AS energy,
           CAST(list_max(list_transform(
                  generate_series(start, least(start + {AUDIO_WINDOW} - 1, length(text))),
                  i -> ascii(substr(text, i, 1))))
                AS BIGINT) AS peak
    FROM wins
    """,
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio analysis over binary payloads (rows-out >
    rows-in: one row per 256-byte analysis window). Arrow-batched
    mapInPandas with integer-exact energy/peak, so the whole
    decode-window-analyze plumbing is oracle-checked byte-for-byte."""
    from minimapreduce_spark._pickle import register_self_by_value

    register_self_by_value()
    return binary_table(spark, sf_dir).mapInPandas(audio_windows, schema=AUDIO_SCHEMA)
