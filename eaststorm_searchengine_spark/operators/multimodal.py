"""Multimodal columns for training-data pipelines (build brief).

Images / audio / video are carried as opaque ``binary`` columns with a
typed metadata struct — the standard webdataset-ish layout:

    media(doc_id long, kind string, content binary,
          meta struct<mime string, width int, height int,
                      duration_ms int, sample_rate int>)

The Spark-side plumbing — schema, deterministic synthesis, Arrow batch
shape, partition sizing for large blobs, vectorized UDF signatures — is
real and tested.  The actual byte decoding (image decode / resample /
frame-sample) is stubbed: the container ships no imaging/audio
libraries, so ``decode_image`` raises ``NotImplementedError`` unless a
deterministic fake decoder is requested (``fake=True``), which parses
the synthetic container format below and exercises the identical code
path shape (bytes in → fixed-size feature vector out).

Synthetic container format (deterministic, self-describing):
  b"FAKEIMG1" | width:uint16 | height:uint16 | payload  (images)
  b"FAKEAUD1" | sample_rate:uint32 | n_samples:uint32 | payload (audio)
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, content binary, "
    "meta struct<mime string, width int, height int, "
    "duration_ms int, sample_rate int>"
)

_IMG_MAGIC = b"FAKEIMG1"
_AUD_MAGIC = b"FAKEAUD1"


def synth_image(doc_id: int) -> tuple[bytes, dict]:
    w = 32 + (doc_id % 7) * 16
    h = 32 + (doc_id % 5) * 16
    payload = hashlib.blake2b(f"img:{doc_id}".encode(), digest_size=32).digest()
    content = _IMG_MAGIC + struct.pack("<HH", w, h) + payload * ((w * h) // 32 + 1)
    meta = {"mime": "image/x-fake", "width": w, "height": h,
            "duration_ms": None, "sample_rate": None}
    return content, meta


def synth_audio(doc_id: int) -> tuple[bytes, dict]:
    sr = 16000
    n = 1000 + (doc_id % 11) * 500
    payload = hashlib.blake2b(f"aud:{doc_id}".encode(), digest_size=32).digest()
    content = _AUD_MAGIC + struct.pack("<II", sr, n) + payload * (n // 16 + 1)
    meta = {"mime": "audio/x-fake", "width": None, "height": None,
            "duration_ms": int(n * 1000 / sr), "sample_rate": sr}
    return content, meta


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents (one image or
    audio blob per doc).  Distributed generation via mapInPandas."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    content, meta = synth_image(did)
                    kind = "image"
                else:
                    content, meta = synth_audio(did)
                    kind = "audio"
                rows.append(
                    {"doc_id": did, "kind": kind, "content": content, "meta": meta}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "kind", "content", "meta"])

    return docs.mapInPandas(gen, MEDIA_SCHEMA)


def decode_image(content: bytes, fake: bool = False) -> np.ndarray:
    """bytes → HxW float array.  Real decode needs an imaging library
    (not shipped in this container) — STUB; the deterministic fake
    parses the synthetic container."""
    if not fake:
        raise NotImplementedError(
            "real image decode requires an imaging library (e.g. Pillow); "
            "not available in this environment — use fake=True for the "
            "deterministic synthetic-container decoder"
        )
    if not content.startswith(_IMG_MAGIC):
        raise ValueError("not a FAKEIMG1 container")
    w, h = struct.unpack_from("<HH", content, 8)
    body = np.frombuffer(content, dtype=np.uint8, count=w * h, offset=12)
    return (body.astype(np.float32) / 255.0).reshape(h, w)


def decode_audio(content: bytes, fake: bool = False) -> tuple[int, np.ndarray]:
    if not fake:
        raise NotImplementedError(
            "real audio decode requires an audio library; use fake=True"
        )
    if not content.startswith(_AUD_MAGIC):
        raise ValueError("not a FAKEAUD1 container")
    sr, n = struct.unpack_from("<II", content, 8)
    body = np.frombuffer(content, dtype=np.uint8, count=n, offset=16)
    return sr, body.astype(np.float32) / 128.0 - 1.0


FEATURE_DIM = 16


def media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """content → fixed-dim feature vector, vectorized over Arrow
    batches (``mapInPandas``).  The feature extractor here is a
    deterministic stand-in (pooled byte statistics); swap the inner
    function for a real model without touching the Spark plumbing."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                if kind == "image":
                    arr = decode_image(bytes(content), fake=fake).ravel()
                else:
                    _, arr = decode_audio(bytes(content), fake=fake)
                pooled = np.resize(arr, (FEATURE_DIM, max(arr.size // FEATURE_DIM, 1))).mean(axis=1)
                feats.append([float(x) for x in pooled])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.mapInPandas(
        extract, "doc_id long, kind string, features array<double>"
    )


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Image resize (nearest-neighbor on the fake decoder) — the
    shape of a distributed media-transform stage."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                img = decode_image(bytes(content), fake=fake)
                yi = (np.arange(height) * img.shape[0] // height)
                xi = (np.arange(width) * img.shape[1] // width)
                resized = img[np.ix_(yi, xi)]
                out.append(
                    {"doc_id": int(did), "width": width, "height": height,
                     "pixels": [float(x) for x in resized.ravel()[:64]]}
                )
            yield pd.DataFrame(out, columns=["doc_id", "width", "height", "pixels"])

    return media.filter(F.col("kind") == "image").mapInPandas(
        rs, "doc_id long, width int, height int, pixels array<double>"
    )
