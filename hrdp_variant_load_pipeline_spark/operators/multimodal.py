"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata alongside. The
Spark-side machinery — schema, partition-friendly batch iteration, Arrow
batch shapes — is real and tested; the actual codec work is stubbed because
media libraries are not in this environment (BASELINE.json north-star
allows a deterministic fake / NotImplementedError stub).

``decode_image_features`` runs through ``mapInPandas``: the production
shape for per-batch Python decode (Arrow transfer, bounded batch memory,
no per-row overhead). Swap ``_fake_decode`` with a real PIL/ffmpeg call to
productionize; everything around it stays.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

DECODE_SCHEMA = (
    "doc_id long, byte_len long, content_md5 string, width int, height int, channels int"
)


def with_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Testdata adapter: treat utf-8 text bytes as the opaque media blob."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.encode(F.col(text_col), "utf-8").alias("payload")
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder (no media libs here).

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload)).
    """
    n = len(payload)
    return (n % 640, (n * 7) % 480, 3)


def decode_image_features(df: DataFrame) -> DataFrame:
    """Per-batch decode via mapInPandas (Arrow-batched; the UDF hot path).

    Input: (doc_id, payload binary). Output: DECODE_SCHEMA.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            decoded = [_fake_decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(p) for p in payloads],
                    "content_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(batches, DECODE_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, byte_len long, sample_rate int, n_samples long, duration_ms long"
)


def decode_audio_features(df: DataFrame) -> DataFrame:
    """Audio-path twin of ``decode_image_features``: mapInPandas over
    (doc_id, payload binary) → deterministic fake header fields.

    Real implementation would parse the container header (e.g. soundfile /
    ffprobe); the Arrow batch plumbing and output schema are the
    production shape.
    """

    def _fake_probe(payload: bytes) -> tuple[int, int, int]:
        n = len(payload)
        rate = 8000 + (n % 5) * 8000  # 8/16/24/32/40 kHz
        samples = n * 64
        return rate, samples, samples * 1000 // rate

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            probed = [_fake_probe(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "sample_rate": [p[0] for p in probed],
                    "n_samples": [p[1] for p in probed],
                    "duration_ms": [p[2] for p in probed],
                }
            )

    return df.mapInPandas(batches, AUDIO_SCHEMA)


def frame_sample_indices(df: DataFrame, n_frames_col: str, every: int) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index (video
    path); pure explode, no Python."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every))),
    )


EMBED_SCHEMA = "doc_id long, embedding array<double>"


def embed_payloads(df: DataFrame, dim: int = 64) -> DataFrame:
    """Binary payload → unit-norm embedding, the hand-off from multimodal
    ingest to the ANN operators (``similarity.ivf_topk``, ``pq.pq_topk``,
    ``embedding_near_dup``): input (doc_id, payload), output
    (doc_id, embedding array<double>).

    Runs through ``mapInPandas`` — the production shape for a batch
    encoder (Arrow transfer in, one model forward per batch, Arrow out).
    The encoder here is a deterministic stand-in (md5-keyed pseudo-random
    projection, unit-normalized — no media/model libs in this
    environment): identical payloads get identical embeddings, so
    downstream dedup/ANN behavior is faithfully exercised. Swap
    ``_fake_embed`` for a real encoder call to productionize; schema,
    batching, and normalization stay.
    """
    import hashlib

    import numpy as np

    def _fake_embed(payload: bytes) -> list[float]:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(dim)
        return (v / np.linalg.norm(v)).tolist()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "embedding": [
                        _fake_embed(bytes(p)) for p in pdf["payload"]
                    ],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, EMBED_SCHEMA)
