"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines at 100 TB carry image/audio/video as ``binary``
columns next to typed metadata, processed by Arrow-batched ``mapInPandas``
operators.  The decode kernels themselves need codec libraries that are NOT
in this container — they are STUBBED behind ``decoder=`` hooks (a
deterministic fake is provided for tests); everything Spark-side — schema,
batching, partitioning, UDF signatures, output shapes — is real.

Schema convention::

    media(media_id string, kind string,           -- 'image'|'audio'|'video'
          payload binary, meta map<string,string>)

Feature extraction emits fixed-width float vectors ready for the ANN /
embedding-dedup operators in this package.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id string, kind string, payload binary, "
                "meta map<string,string>")

FEATURE_DIM = 32
FEATURE_SCHEMA = f"media_id string, kind string, n_bytes long, feature array<float>"


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hashes the payload into a
    unit-norm float vector.  Replace with a real codec via the ``decoder``
    argument of ``extract_features`` (NotImplementedError guards misuse)."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32).astype(np.float64)
    v = raw / np.linalg.norm(raw)
    return v.astype(np.float32)


def real_decode(payload: bytes, kind: str) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; inject a "
        "decoder (e.g. PIL/librosa-backed) via extract_features(decoder=...)"
    )


def extract_features(df: DataFrame,
                     decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
                     batch_size_hint: int | None = None) -> DataFrame:
    """media table → (media_id, kind, n_bytes, feature array<float>[32]).

    ``mapInPandas``: the decode runs per Arrow batch; the per-item loop is
    inherent to codec APIs (a batch of images decodes item-wise) — everything
    around it (transfer, batching, output assembly) is columnar."""
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int64"),
                "feature": [f.tolist() for f in feats],
            })

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes are
    seeded; two planted exact-duplicate payload pairs."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(64, 512)))
        rows.append((f"m{i}", kind, payload, {"w": "64", "h": "64"}))
    rows.append(("dup_a", "image", rows[0][2], {"w": "64", "h": "64"}))
    rows.append(("dup_b", "audio", rows[1][2], {"w": "64", "h": "64"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
