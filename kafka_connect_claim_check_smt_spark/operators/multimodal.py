"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, with decode/feature/resize/frame-sample as Arrow-batched stages.

The Spark-side machinery here is real and tested — schemas, claim-check
interop (binary payloads offload through the same store), mapInPandas batch
shapes, partitioning. The codec layer is REAL for the formats decodable with
stdlib + numpy in this container:

- **BMP images** (24-bit uncompressed): pure-numpy header parse + pixel
  decode → grayscale block-averaged fixed-dim feature, true height/width.
- **WAV audio** (PCM via stdlib ``wave``): downmix → fixed-dim RMS envelope
  feature; height=n_channels, width=sample_rate.

Compressed formats (jpeg/png/mp4 …) still need PIL/torchaudio, which this
container lacks — those raise NotImplementedError unless ``fake=True``
selects the deterministic fake decoder (tests use it to pin the batch/shape
contract). Swapping in a real library only replaces the inner numpy
function — the Spark plan is unchanged.
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
    sniff = F.when(
        (F.substring(c, 1, 4) == F.lit(b"RIFF")) & (F.substring(c, 9, 4) == F.lit(b"WAVE")),
        F.lit("wav"),
    ).otherwise(sniff)
    sniff = F.when(F.substring(c, 1, 2) == F.lit(b"BM"), F.lit("bmp")).otherwise(sniff)
    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.octet_length(c).cast("long").alias("n_bytes"),
        F.sha2(c, 256).alias("sha256"),
        sniff.alias("magic"),
    )


FEATURE_SCHEMA = "id long, feature array<float>, height int, width int"


def decode_bmp(raw: bytes):
    """Real 24-bit uncompressed BMP decode, pure numpy (no codec library).

    Returns (grayscale float array h×w, height, width). Handles both
    bottom-up (positive height, the common case) and top-down DIBs, and the
    4-byte row padding the format requires."""
    import numpy as np

    if raw[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    pixel_off = int.from_bytes(raw[10:14], "little")
    w = int.from_bytes(raw[18:22], "little", signed=True)
    h = int.from_bytes(raw[22:26], "little", signed=True)
    bpp = int.from_bytes(raw[28:30], "little")
    comp = int.from_bytes(raw[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24bpp uncompressed BMP (got bpp={bpp} comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4  # rows pad to 4-byte boundaries
    px = (
        np.frombuffer(raw, np.uint8, count=row_size * h, offset=pixel_off)
        .reshape(h, row_size)[:, : w * 3]
        .reshape(h, w, 3)
    )
    if bottom_up:
        px = px[::-1]
    return px.mean(axis=2), h, w


def decode_wav(raw: bytes):
    """Real PCM WAV decode via stdlib ``wave`` + numpy.

    Returns (mono float samples in [-1, 1], sample_rate, n_channels)."""
    import io
    import wave as _wave

    import numpy as np

    with _wave.open(io.BytesIO(raw), "rb") as wf:
        nch, sw, rate, nframes = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnframes(),
        )
        pcm = wf.readframes(nframes)
    if sw == 1:  # unsigned 8-bit
        x = np.frombuffer(pcm, np.uint8).astype(np.float64) - 128.0
        x /= 128.0
    elif sw == 2:
        x = np.frombuffer(pcm, "<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(pcm, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {sw}")
    return x.reshape(-1, nch).mean(axis=1), rate, nch


def _grid_feature(arr, feature_dim: int):
    """Block-average a 1-D or flattened signal down to feature_dim values —
    the deterministic 'resize' used for both image grids and audio
    envelopes."""
    import numpy as np

    flat = np.asarray(arr, dtype=np.float64).ravel()
    if flat.size == 0:
        return np.zeros(feature_dim, dtype=np.float32)
    # bucket i averages flat[floor(i*n/d) : floor((i+1)*n/d)] (last non-empty)
    edges = (np.arange(feature_dim + 1) * flat.size) // feature_dim
    sums = np.add.reduceat(flat, np.minimum(edges[:-1], flat.size - 1))
    counts = np.maximum(np.diff(edges), 1)
    return (sums / counts).astype(np.float32)


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

    mapInPandas (Arrow batches; decode is numpy-vectorized per row). The
    codec is sniffed per row from magic bytes:

    - BMP → real decode (:func:`decode_bmp`); feature = grayscale/255
      block-averaged to ``feature_dim``; height/width are the image's.
    - WAV → real decode (:func:`decode_wav`); feature = per-block RMS
      envelope over ``feature_dim`` blocks; height=n_channels,
      width=sample_rate.
    - anything else → NotImplementedError unless ``fake=True``, which uses
      the deterministic fake decoder (feature[i] = byte[i % n]/255,
      height/width from the first bytes) to pin the plumbing contract.

    ``batch_hook(n)`` lets tests observe real Arrow batch sizes."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_hook is not None:
                batch_hook(len(pdf))
            feats, hs, ws = [], [], []
            for raw in pdf[data_col]:
                raw = bytes(raw)
                if fake:
                    # fake=True means EVERY payload goes through the
                    # deterministic fake decoder (the plumbing-contract mode,
                    # guaranteed never to raise) — even bytes that happen to
                    # start with a real codec's magic.
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    idx = np.arange(feature_dim) % max(len(arr), 1)
                    feats.append((arr[idx] / 255.0).astype(np.float32))
                    hs.append(int(arr[0]) if len(arr) else 0)
                    ws.append(int(arr[1]) if len(arr) > 1 else 0)
                elif raw[:2] == b"BM":
                    gray, h, w = decode_bmp(raw)
                    feats.append(_grid_feature(gray / 255.0, feature_dim))
                    hs.append(h)
                    ws.append(w)
                elif raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                    x, rate, nch = decode_wav(raw)
                    # RMS envelope: block-average the power, then sqrt
                    feats.append(np.sqrt(_grid_feature(x * x, feature_dim)).astype(np.float32))
                    hs.append(nch)
                    ws.append(rate)
                else:
                    raise NotImplementedError(
                        "no codec for this format in this environment (real "
                        "decoders: 24bpp BMP, PCM WAV) - pass fake=True or "
                        "install PIL/torchaudio and extend the decoder"
                    )
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
