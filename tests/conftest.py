from __future__ import annotations

import pytest

from datacapsule_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def smoke_corpus_path():
    from datacapsule_spark.corpus import ensure_corpus

    return ensure_corpus("smoke")


@pytest.fixture(scope="session")
def smoke_repos(spark, smoke_corpus_path):
    return spark.read.parquet(smoke_corpus_path)
