"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata —
the Spark-side machinery (schemas, Arrow batching via mapInPandas,
partition shape) is real and tested; the actual codec work is STUBBED
because no image/audio library exists in this container:

* :func:`decode_media` raises ``NotImplementedError`` unless a
  decoder is injected — the marked seam for pillow/libav in prod.
* :func:`fake_fetch_media` / the feature extractor use a
  deterministic md5-driven byte generator so tests exercise the full
  distributed path with verifiable values.

Pattern notes for 100 TB: media bytes ride in their own table keyed by
media_ref (never inline with text spans — they'd destroy scan locality
for text-only queries); feature extraction is mapInPandas over
Arrow-sized batches with binary columns, bounded by
``maxRecordsPerBatch`` to keep worker memory flat.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "fake_fetch_media",
    "decode_media",
    "frame_sample_stage",
    "media_feature_stage",
    "resize_stage",
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_FEATURE_DIM = 16


def fake_fetch_media(media_ref: str, n_bytes: int = 4096) -> bytes:
    """Deterministic stand-in for object-store fetch: a PCG64 byte
    stream seeded from md5(ref) — same ref → same payload everywhere.
    (A chained-md5 keystream did the same job ~15x slower: 256 Python
    hash calls per 4 KB payload.)"""
    import numpy as np

    seed = int.from_bytes(hashlib.md5(media_ref.encode()).digest(), "big")
    return np.random.Generator(np.random.PCG64(seed)).bytes(n_bytes)


def decode_media(payload: bytes, media_type: str, decoder=None):
    """Decode a media payload. STUB: the container ships no codec libs;
    inject ``decoder(payload, media_type)`` in prod (pillow/libav)."""
    if decoder is not None:
        return decoder(payload, media_type)
    raise NotImplementedError(
        "media decoding requires a codec library not present in this "
        "environment; inject `decoder=` (see module docstring)"
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake 'embedding': 16-bin byte histogram, L1-normalized
    — numerically checkable end-to-end without a codec.
    """
    import numpy as np

    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=_FEATURE_DIM).astype("float64")
            total = hist.sum() or 1.0
            feats.append((hist / total).round(6).tolist())
        yield pd.DataFrame(
            {
                "media_ref": pdf["media_ref"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "features": feats,
            }
        )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def media_feature_stage(media_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over a MEDIA_META_SCHEMA frame."""
    return media_df.select(
        "media_ref", "media_type", "payload", "n_bytes"
    ).mapInPandas(_feature_batches, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_frame_bytes", T.LongType()),
    ]
)


def frame_sample_stage(
    media_df: DataFrame, n_frames: int = 4, frame_bytes: int = 256
) -> DataFrame:
    """Video frame sampling as a mapInPandas 1→N fan-out.

    Real decode needs libav (the :func:`decode_media` seam); the
    DISTRIBUTED SHAPE is the point and is fully real: each video row
    fans out into ``n_frames`` evenly spaced frame rows (deterministic
    byte-slice stand-ins for decoded frames), images pass through as a
    single frame, audio contributes none. Frame rows are keyed
    (media_ref, frame_idx) so downstream per-frame featurization joins/
    groups exactly as it would with real decoded frames. Batch-shape
    note for 100 TB: output rows ≈ n_frames × input rows — bound
    ``maxRecordsPerBatch`` on the INPUT side so the fan-out stays
    within worker memory.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs: list = []
            idxs: list = []
            offs: list = []
            frames: list = []
            for ref, mtype, payload in zip(
                pdf["media_ref"], pdf["media_type"], pdf["payload"]
            ):
                if mtype == "video":
                    n = len(payload)
                    span = max(n - frame_bytes, 0)
                    for i in range(n_frames):
                        off = (span * i) // max(n_frames - 1, 1)
                        chunk = bytes(payload[off : off + frame_bytes])
                        refs.append(ref)
                        idxs.append(i)
                        offs.append(off)
                        frames.append(chunk)
                elif mtype == "image":
                    refs.append(ref)
                    idxs.append(0)
                    offs.append(0)
                    frames.append(bytes(payload))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_offset": pd.array(offs, dtype="int64"),
                    "frame": frames,
                    "n_frame_bytes": pd.array(
                        [len(f) for f in frames], dtype="int64"
                    ),
                }
            )

    return media_df.select("media_ref", "media_type", "payload").mapInPandas(
        gen, FRAME_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
    ]
)


def resize_stage(
    media_df: DataFrame, target_bytes: int = 1024, resizer=None
) -> DataFrame:
    """Image resize as a mapInPandas transform (the brief's
    decode→resize step).

    Real resizing needs a codec (inject ``resizer(payload, media_type,
    target_bytes) -> bytes`` — pillow in prod, same seam discipline as
    :func:`decode_media`); the default stand-in byte-subsamples the
    payload to ``target_bytes`` with an even deterministic stride, so
    the distributed shape (schema, batching, size accounting) is fully
    exercised and output sizes are exactly verifiable. Non-image rows
    pass through untouched — resize is an image transform.
    """

    def default_resizer(payload: bytes, media_type: str, target: int) -> bytes:
        n = len(payload)
        if n <= target:
            return bytes(payload)
        # even deterministic stride; exact target length
        return bytes(payload[(i * n) // target] for i in range(target))

    fn = resizer or default_resizer

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for mtype, payload in zip(pdf["media_type"], pdf["payload"]):
                if mtype == "image":
                    outs.append(fn(bytes(payload), mtype, target_bytes))
                else:
                    outs.append(bytes(payload))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "payload": outs,
                    "n_bytes": pd.array([len(p) for p in outs], dtype="int64"),
                    "orig_bytes": pd.array(
                        [len(bytes(p)) for p in pdf["payload"]], dtype="int64"
                    ),
                }
            )

    # only the columns gen() reads — n_bytes is recomputed for the
    # output, so requiring it on input would be a dead Arrow column
    return media_df.select("media_ref", "media_type", "payload").mapInPandas(
        gen, RESIZED_SCHEMA
    )


def media_table_from_refs(refs_df: DataFrame, n_bytes: int = 4096) -> DataFrame:
    """Materialize a media table (fake payloads) from a media_ref column —
    the sandbox stand-in for the object-store fetch stage. Stays
    Arrow-batched via mapInPandas; the ref→type rule is suffix-based."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [fake_fetch_media(r, n_bytes) for r in pdf["media_ref"]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": [
                        "video" if r.endswith((".mp4", ".webm")) else
                        "audio" if r.endswith((".mp3", ".wav")) else "image"
                        for r in pdf["media_ref"]
                    ],
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return refs_df.select("media_ref").distinct().mapInPandas(gen, MEDIA_META_SCHEMA)
