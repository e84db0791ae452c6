"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side machinery (schemas, Arrow batch shapes, mapInPandas iteration,
partition sizing) is real and tested. The actual codec work is STUBBED —
decode libraries are not in this container — behind
:func:`register_decoder` / a deterministic fake, with ``NotImplementedError``
raised for unregistered modalities. Swapping in a real decoder is a one-line
registration; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "register_decoder",
    "deterministic_fake_decoder",
    "attach_media_metadata",
    "extract_features",
]

# payload + typed metadata for an opaque media column
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

# modality -> Callable[(bytes,), dict] returning keys:
#   feature: list[float], width: int, height: int, n_frames: int
_DECODERS: dict[str, Callable[[bytes], dict]] = {}


def register_decoder(modality: str, fn: Callable[[bytes], dict]) -> None:
    """Plug a real decoder (e.g. PIL/ffmpeg-backed) for a modality."""
    _DECODERS[modality] = fn


def deterministic_fake_decoder(payload: bytes) -> dict:
    """Container-friendly stand-in: derives a fixed-size feature vector and
    fake dimensions deterministically from the bytes (md5-seeded). Shapes and
    dtypes match what a real image decode + pooled embedding would produce."""
    import hashlib

    digest = hashlib.md5(payload).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return {
        "feature": rng.standard_normal(16).astype(np.float32).tolist(),
        "width": int(64 + digest[8] % 64),
        "height": int(64 + digest[9] % 64),
        "n_frames": 1,
    }


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Derive byte length + sha256 metadata columns JVM-side (no decode)."""
    return df.withColumns(
        {
            "n_bytes": F.length(F.col(payload_col)).cast("long"),
            "payload_sha": F.sha2(F.col(payload_col), 256),
        }
    )


def extract_features(
    df: DataFrame,
    modality_col: str = "modality",
    payload_col: str = "payload",
    id_col: str = "media_id",
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` over Arrow batches.

    Each batch dispatches to the registered decoder for its rows' modality;
    unregistered modalities raise ``NotImplementedError`` naming the
    modality (stub contract). The iterator form keeps peak memory at one
    Arrow batch of payloads regardless of partition size — size batches
    with ``spark.sql.execution.arrow.maxRecordsPerBatch`` for big payloads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights, frames = [], [], [], []
            for modality, payload in zip(pdf[modality_col], pdf[payload_col]):
                decoder = _DECODERS.get(modality)
                if decoder is None:
                    raise NotImplementedError(
                        f"no decoder registered for modality {modality!r}; "
                        "register one with multimodal.register_decoder()"
                    )
                d = decoder(bytes(payload))
                feats.append(d["feature"])
                widths.append(d["width"])
                heights.append(d["height"])
                frames.append(d["n_frames"])
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "modality": pdf[modality_col],
                    "feature": feats,
                    "width": widths,
                    "height": heights,
                    "n_frames": frames,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)
