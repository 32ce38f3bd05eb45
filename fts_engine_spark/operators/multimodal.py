"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested; the actual media decode is
STUBBED (this container has no image/audio libraries): ``decode_media``
raises ``NotImplementedError`` unless a deterministic fake decoder is
requested, which derives metadata/features from the payload bytes (md5 +
length) so tests are reproducible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("size_bytes", LongType(), False),
        StructField("payload_md5", StringType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"<htm", "html"),
    (b"<!do", "html"),
]


def _sniff(b: bytes) -> str | None:
    head = b[:8].lower() if b[:1] in (b"<",) else b[:8]
    for magic, fmt in _MAGIC:
        if head[: len(magic)].lower().startswith(magic.lower()):
            return fmt
    return None


def _fake_decode(payload: bytes, feat_dim: int) -> tuple[int, int, np.ndarray]:
    """Deterministic fake: dims + feature vector seeded from the digest."""
    digest = hashlib.md5(payload).digest()
    w = 16 + digest[0] % 240
    h = 16 + digest[1] % 240
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    feat = rng.standard_normal(feat_dim).astype(np.float32)
    return w, h, feat


class DecoderUnavailableError(RuntimeError):
    """A registered decoder's backing library is not installed here."""


def _make_pil_decoder(feat_dim: int):
    """Real image decode via Pillow when present (it is not in this
    sandbox — the import failure is the documented environment limitation;
    the Spark plumbing around it is identical to the fake path)."""
    try:
        from PIL import Image
    except ImportError as e:
        raise DecoderUnavailableError(
            "decoder 'pil' needs Pillow, which is not installed in this "
            f"environment; available decoders: {available_decoders()}"
        ) from e
    import io

    def decode(payload: bytes) -> tuple[int, int, np.ndarray]:
        im = Image.open(io.BytesIO(payload)).convert("L")
        w, h = im.size
        # feature = row-mean profile resampled to feat_dim
        arr = np.asarray(im, dtype=np.float32)
        prof = arr.mean(axis=1)
        idx = np.linspace(0, len(prof) - 1, feat_dim)
        return w, h, np.interp(idx, np.arange(len(prof)), prof).astype(np.float32)

    return decode


def _make_fake_decoder(feat_dim: int):
    return lambda payload: _fake_decode(payload, feat_dim)


# decoder registry — the reference's codec-registry pattern (SURVEY.md §2.1
# S11): name -> factory(feat_dim) -> (payload bytes -> (w, h, feature)).
# 'fake' is the sandbox default; real decoders register here and fail with
# a NAMED error listing alternatives when their library is absent.
DECODERS = {
    "fake": _make_fake_decoder,
    "pil": _make_pil_decoder,
}


def available_decoders() -> list[str]:
    return sorted(DECODERS)


def decode_media(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    feat_dim: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """mapInPandas decode: (id, binary) → typed media metadata + feature.

    ``decoder`` selects from the registry (``DECODERS``): ``'fake'`` is the
    deterministic md5-seeded stand-in exercising the full Spark plumbing
    (Arrow batch in, Arrow batch out, schema enforced, partition-parallel);
    ``'pil'`` does real image decode when Pillow is installed and raises
    :class:`DecoderUnavailableError` naming the available decoders when not.
    Unknown names raise ``ValueError`` listing the registry.
    """
    if decoder not in DECODERS:
        raise ValueError(
            f"unknown decoder {decoder!r}; available: {available_decoders()}"
        )
    decode = DECODERS[decoder](feat_dim)  # fail fast on the driver

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, md5s, fmts, ws, hs, feats = [], [], [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload) if payload is not None else b""
                ids.append(int(doc_id))
                sizes.append(len(b))
                md5s.append(hashlib.md5(b).hexdigest())
                fmts.append(_sniff(b))
                w, h, feat = decode(b)
                ws.append(w)
                hs.append(h)
                feats.append(feat)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "size_bytes": pd.array(sizes, dtype="int64"),
                    "payload_md5": md5s,
                    "format": fmts,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "feature": feats,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=MEDIA_META_SCHEMA)


def binary_stats(df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """(id, size_bytes, payload_md5) — pure built-ins, no Python."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.octet_length(F.col(binary_col)).cast("long").alias("size_bytes"),
        F.md5(F.col(binary_col)).alias("payload_md5"),
    )
