"""Record codecs: PLAIN (identity) and GZIP.

Reference parity (Codec.scala:14-43): quebic compresses each serialized
record with the publisher's codec and stores the codec id per entry.

In the Spark engine the primary compression lever is Parquet's columnar
codec (table-level, configured at queue creation — a strict upgrade).
These record codecs remain for (a) API parity, (b) a literal
per-record-compressed BINARY mode used when byte-level behavior matters.
"""

from __future__ import annotations

import gzip as _gzip
from dataclasses import dataclass


@dataclass(frozen=True)
class Codec:
    id: int
    name: str

    def encode(self, data: bytes) -> bytes:
        raise NotImplementedError

    def decode(self, data: bytes) -> bytes:
        raise NotImplementedError

    # Parquet codec used for queue log files created with this codec.
    @property
    def parquet_codec(self) -> str:
        raise NotImplementedError


class _Plain(Codec):
    def encode(self, data: bytes) -> bytes:  # Codec.scala:20-24
        return bytes(data)

    def decode(self, data: bytes) -> bytes:
        return bytes(data)

    @property
    def parquet_codec(self) -> str:
        # 'snappy' (not 'uncompressed'): PLAIN in the reference means "no
        # per-record gzip", not "no storage compression"; columnar snappy
        # is the idiomatic Spark default and strictly faster at scale.
        return "snappy"


class _Gzip(Codec):
    def encode(self, data: bytes) -> bytes:  # Codec.scala:26-43
        return _gzip.compress(bytes(data), mtime=0)  # mtime=0: deterministic

    def decode(self, data: bytes) -> bytes:
        return _gzip.decompress(data)

    @property
    def parquet_codec(self) -> str:
        return "gzip"


PLAIN = _Plain(0, "PLAIN")
GZIP = _Gzip(1, "GZIP")

_BY_ID = {c.id: c for c in (PLAIN, GZIP)}
_BY_NAME = {c.name: c for c in (PLAIN, GZIP)}


def codec_of(id_or_name: int | str) -> Codec:
    """Lookup (Codec.valueOf, Codec.scala:18)."""
    table = _BY_ID if isinstance(id_or_name, int) else _BY_NAME
    try:
        return table[id_or_name]  # type: ignore[index]
    except KeyError:
        raise ValueError(f"unknown codec: {id_or_name!r}") from None
