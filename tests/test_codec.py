"""Codec round-trips (CodecTest.scala:12-24 parity: seeded random bytes)."""

import random

import pytest

from quebic_spark import GZIP, PLAIN
from quebic_spark.codec import codec_of


@pytest.mark.parametrize("codec", [PLAIN, GZIP])
def test_roundtrip_seeded_random(codec):
    rnd = random.Random(12345)
    data = bytes(rnd.getrandbits(8) for _ in range(1024))
    assert codec.decode(codec.encode(data)) == data


def test_gzip_actually_compresses():
    data = b"a" * 10_000
    assert len(GZIP.encode(data)) < len(data)
    assert PLAIN.encode(data) == data


def test_gzip_deterministic():
    data = b"hello world" * 100
    assert GZIP.encode(data) == GZIP.encode(data)


def test_lookup():
    assert codec_of(0) is PLAIN
    assert codec_of("GZIP") is GZIP
    with pytest.raises(ValueError):
        codec_of(7)


def test_parquet_codec_mapping():
    assert PLAIN.parquet_codec == "snappy"
    assert GZIP.parquet_codec == "gzip"
