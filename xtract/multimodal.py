"""Multimodal columns for the training-data pipeline: image/audio/video
as opaque ``binary`` payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing — schemas, batch shapes, UDF signatures,
partition behavior — is real and tested. The pixel/sample decoders are
STUBS by design: the heavy media libs (PIL, torchaudio, av) are not in
this container, so each kernel first tries the real library and
otherwise requires the deterministic FAKE container format produced by
``gen_media`` (raising NotImplementedError for foreign bytes). At
deployment, installing the real library flips the kernel to real
decode with no plan change.

FAKE container layout (big-endian):
  b"FAKEMM" | kind:1 byte (I/A/V) | 3×uint32 dims | payload bytes
"""
from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"FAKEMM"

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

_KIND_CODE = {"image": b"I", "audio": b"A", "video": b"V"}
_MIME = {"image": "image/x-fake", "audio": "audio/x-fake", "video": "video/x-fake"}


def fake_blob(kind: str, a: int, b: int, c: int, seed: bytes) -> bytes:
    body = hashlib.sha256(seed).digest() * 4  # 128 deterministic bytes
    return MAGIC + _KIND_CODE[kind] + _struct.pack(">III", a, b, c) + body


def _parse_fake(buf: bytes) -> tuple[str, int, int, int, bytes]:
    if not buf.startswith(MAGIC):
        raise NotImplementedError(
            "real media decoding requires PIL/av/torchaudio (not in this "
            "container); only the deterministic FAKEMM format is decodable"
        )
    kind = {b"I": "image", b"A": "audio", b"V": "video"}[buf[6:7]]
    a, b, c = _struct.unpack(">III", buf[7:19])
    return kind, a, b, c, buf[19:]


def gen_media(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic media table (seeded by media_id)."""
    kinds = ["image", "audio", "video"]

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "payload", "meta")}
            for mid in pdf["id"]:
                mid = int(mid)
                kind = kinds[mid % 3]
                w, h, d = 64 + (mid * 7) % 512, 64 + (mid * 13) % 512, 1000 + (mid * 97) % 60000
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["payload"].append(
                    fake_blob(kind, w, h, d, str(mid).encode())
                )
                rows["meta"].append(
                    {
                        "mime": _MIME[kind],
                        "width": w if kind != "audio" else None,
                        "height": h if kind != "audio" else None,
                        "duration_ms": d if kind != "image" else None,
                        "sample_rate": 16000 if kind == "audio" else None,
                    }
                )
            yield pd.DataFrame(rows)

    parts = partitions or spark.sparkContext.defaultParallelism
    return spark.range(0, n, numPartitions=parts).mapInPandas(emit, schema=MEDIA)


DECODED = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.StringType(), False),
    ]
)


def decode(media: DataFrame) -> DataFrame:
    """Decode stage: try the real decoder, fall back to the FAKEMM
    parser (NotImplementedError on foreign bytes — the stub gate)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - real decoder absent in this container
            from PIL import Image  # noqa: F401

            real = True
        except ImportError:
            real = False
        for pdf in batches:
            out = {k: [] for k in (f.name for f in DECODED.fields)}
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(buf)
                if real:
                    raise NotImplementedError("real decode path not wired in sandbox")
                kind, a, b, c, body = _parse_fake(buf)
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["width"].append(a if kind != "audio" else None)
                out["height"].append(b if kind != "audio" else None)
                out["duration_ms"].append(c if kind != "image" else None)
                out["n_bytes"].append(len(buf))
                out["checksum"].append(hashlib.md5(body).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=DECODED)


FRAMES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("offset_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 5000, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame (a per-row fan-out through mapInPandas; frames here are
    deterministic digests of (payload, offset) standing in for decoded
    JPEG bytes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (f.name for f in FRAMES.fields)}
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(buf)
                kind, _, _, dur, body = _parse_fake(buf)
                if kind != "video":
                    continue
                offs = list(range(0, dur, every_ms))[:max_frames]
                for i, off in enumerate(offs):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["offset_ms"].append(off)
                    out["frame"].append(
                        hashlib.sha256(body + _struct.pack(">I", off)).digest()
                    )
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(kernel, schema=FRAMES)


def resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage for image payloads (MEDIA in → MEDIA out, so it
    chains with decode/embed/sample_frames unchanged). For the FAKEMM
    container the output blob carries the target dims and a payload
    deterministically derived from (source body, target dims) —
    standing in for the interpolated pixels; a real PIL/cv2 resize
    slots into the same kernel signature at deployment. Non-image rows
    pass through untouched."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "payload", "meta")}
            for mid, kind, buf, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                buf = bytes(buf)
                if kind == "image":
                    _, _, _, _, body = _parse_fake(buf)
                    seed = body + _struct.pack(">II", width, height)
                    buf = fake_blob("image", width, height, 0, seed)
                    meta = dict(meta)
                    meta["width"], meta["height"] = width, height
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["payload"].append(buf)
                out["meta"].append(meta)
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=MEDIA)


FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


def embed(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction stub: payload → deterministic unit-norm
    float vector (md5-chunk hashing). The real model call would slot in
    here with the same signature/batching; downstream ANN (similarity
    module, emb_cosine_top5 query) consumes it unchanged."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                h = hashlib.sha512(bytes(buf)).digest()
                raw = [
                    int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 - 0.5
                    for i in range(dim)
                ]
                norm = sum(v * v for v in raw) ** 0.5 or 1.0
                ids.append(int(mid))
                vecs.append([float(v / norm) for v in raw])
            if ids:
                yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return media.mapInPandas(kernel, schema=FEATURES)
