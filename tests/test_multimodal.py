"""Multimodal decoder registry (SURVEY.md §2.1 S11 codec-registry pattern):
the deterministic fake decoder is the sandbox default and oracle-stable;
real decoders fail with a NAMED error listing the registry when their
library is absent; unknown names are rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_engine_spark.operators import multimodal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    return docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )


def test_fake_decoder_is_deterministic(spark, payloads):
    a = sorted(map(tuple, multimodal.decode_media(payloads).collect()))
    b = sorted(map(tuple, multimodal.decode_media(payloads).collect()))
    assert a == b
    assert len(a) == 50


def test_fake_decoder_metadata_matches_md5_derivation(spark, payloads):
    import hashlib

    rows = multimodal.decode_media(payloads).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .limit(50)
        .collect()
    }
    for r in rows:
        digest = hashlib.md5(texts[r["doc_id"]].encode()).digest()
        assert r["width"] == 16 + digest[0] % 240
        assert r["height"] == 16 + digest[1] % 240
        assert r["payload_md5"] == hashlib.md5(
            texts[r["doc_id"]].encode()
        ).hexdigest()


def test_unavailable_real_decoder_raises_named_error(payloads):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed here; the unavailable path won't fire")
    except ImportError:
        pass
    with pytest.raises(multimodal.DecoderUnavailableError) as ei:
        multimodal.decode_media(payloads, decoder="pil")
    # the named error lists what IS available
    assert "fake" in str(ei.value) and "pil" in str(ei.value)


def test_unknown_decoder_rejected(payloads):
    with pytest.raises(ValueError, match="fake"):
        multimodal.decode_media(payloads, decoder="webp2000")


def test_registry_lists_fake_and_pil():
    assert {"fake", "pil"} <= set(multimodal.available_decoders())
