from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from fts_engine_spark.session import get_spark

    s = get_spark(app_name="fts-tests", master="local[4]", shuffle_partitions="8")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """120-doc deterministic corpus parquet (input_hint schema)."""
    from tools.gen_corpus import write_corpus

    path = str(tmp_path_factory.mktemp("corpus") / "docs_small.parquet")
    write_corpus(path, 120)
    return path


@pytest.fixture(scope="session")
def small_index(spark, small_corpus, tmp_path_factory):
    """Index over the small corpus: tiny shards (multiple shards + waves) to
    exercise the distributed paths."""
    from fts_engine_spark.build import BuildConfig, build_index

    index_dir = str(tmp_path_factory.mktemp("index") / "idx_small")
    docs = spark.read.parquet(small_corpus)
    cfg = BuildConfig(preset="by_lang", shard_size=32, id_buckets=8, n_waves=2)
    meta = build_index(spark, docs, index_dir, cfg)
    return index_dir, meta
