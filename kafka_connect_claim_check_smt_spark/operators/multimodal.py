"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, with decode/feature/resize/frame-sample as Arrow-batched stages.

The Spark-side machinery here is real and tested — schemas, claim-check
interop (binary payloads offload through the same store), mapInPandas batch
shapes, partitioning. The *codec* step is stubbed: this container has no
image/audio libraries, so decoders raise NotImplementedError unless
``fake=True`` selects the deterministic fake decoder (used by tests to pin
the batch/shape contract). Swapping in PIL/torchaudio later only replaces the
inner numpy function — the Spark plan is unchanged.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video|unknown
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("magic", T.StringType()),        # sniffed container format
    ]
)

def media_metadata(data: Column | str, media_type: str = "unknown") -> Column:
    """Typed metadata struct over a binary column — pure Catalyst: size, hash,
    magic-byte container sniff (no Python)."""
    c = F.col(data) if isinstance(data, str) else data
    # sniff container format from magic prefix bytes (binary comparisons)
    sniff = F.lit("unknown")
    sniff = F.when(F.substring(c, 2, 3) == F.lit(b"PNG"), F.lit("png")).otherwise(sniff)
    sniff = F.when(F.substring(c, 1, 3) == F.lit(bytes([0xFF, 0xD8, 0xFF])), F.lit("jpeg")).otherwise(sniff)
    sniff = F.when(F.substring(c, 1, 4) == F.lit(b"GIF8"), F.lit("gif")).otherwise(sniff)
    sniff = F.when(F.substring(c, 1, 4) == F.lit(b"RIFF"), F.lit("riff")).otherwise(sniff)
    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.octet_length(c).cast("long").alias("n_bytes"),
        F.sha2(c, 256).alias("sha256"),
        sniff.alias("magic"),
    )


FEATURE_SCHEMA = "id long, feature array<float>, height int, width int"


def decode_and_featurize(
    df: DataFrame,
    *,
    id_col: str = "id",
    data_col: str = "data",
    feature_dim: int = 16,
    fake: bool = False,
    batch_hook=None,
) -> DataFrame:
    """Decode binary media and emit a fixed-dim feature vector.

    mapInPandas (Arrow batches; the decode loop is numpy-vectorized where the
    codec allows). ``fake=True`` → deterministic fake decoder: feature[i] =
    byte[i % n] / 255, height/width from the first bytes — pins the plumbing
    contract without codec libraries. ``batch_hook(pdf)`` lets tests observe
    real batch shapes."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_hook is not None:
                batch_hook(len(pdf))
            if not fake:
                raise NotImplementedError(
                    "no media codec in this environment - pass fake=True or "
                    "install PIL/torchaudio and replace the decoder"
                )
            feats, hs, ws = [], [], []
            for raw in pdf[data_col]:
                arr = np.frombuffer(raw, dtype=np.uint8)
                idx = np.arange(feature_dim) % max(len(arr), 1)
                feats.append((arr[idx] / 255.0).astype(np.float32))
                hs.append(int(arr[0]) if len(arr) else 0)
                ws.append(int(arr[1]) if len(arr) > 1 else 0)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "feature": feats,
                    "height": pd.Series(hs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    *,
    id_col: str = "id",
    data_col: str = "data",
    every_n_bytes: int = 64,
    max_frames: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling stub: one row per sampled 'frame'. The real
    implementation would seek keyframes; the fake slices the byte stream
    deterministically. Output is exploded (id, frame_no, frame binary)."""
    import pandas as pd

    schema = "id long, frame_no int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("no video codec in this environment - pass fake=True")
            ids, nos, frames = [], [], []
            for i, raw in zip(pdf[id_col], pdf[data_col]):
                for n in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(int(i))
                    nos.append(n)
                    frames.append(bytes(raw[n * every_n_bytes : (n + 1) * every_n_bytes]))
            yield pd.DataFrame({"id": ids, "frame_no": pd.Series(nos, dtype="int32"), "frame": frames})

    return df.mapInPandas(run, schema)
