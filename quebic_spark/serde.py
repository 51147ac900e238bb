"""Record-level serialization: the ``Schema.serialize``/``deserialize``
operation pair (Schema.scala:21-59), with per-record codec compression
(Codec.scala:14-43).

Byte-level compatibility with quebic's wire format (varint ints, 4-bit
packed schema) is an explicit non-goal (SURVEY §7.5) — Parquet replaces
it as the storage format. This module provides the *operation* for the
literal per-record-BINARY mode: pack one validated record to bytes and
back, deterministically, with optional GZIP.

Format (big-endian):
    INTEGER  8B signed
    REAL     8B IEEE-754
    TEXT     4B length + UTF-8 bytes
    BINARY   4B length + raw bytes
    TENSOR   4B ndim, 4B per dim, 8B per value (row-major)
The whole record is then passed through the codec.

``serialize_framed``/``deserialize_framed`` add the reference's
per-entry codec id (JournaledFile.scala:322) as a 1-byte prefix, making
each blob self-describing: records compressed with different codecs can
coexist in one queue/file and the reader never consults out-of-band
state to decode them.

Deliberate duplication: the corruption scaffolding here (codec-decode
wrap, short-read guard, trailing-garbage check) structurally mirrors
``sources/quebic_format.wire_deserialize``. They are NOT shared on
purpose — the two are independent wire formats, each byte-pinned by
its own golden fixtures, and a helper parameterized over both would
couple fixture-pinned code paths so a change for one format silently
rewrites the other's bytes or messages. Taxonomy fixes must be applied
to BOTH (checklist: encode wrap, decode wrap, need(), over-run check).
"""

from __future__ import annotations

import struct
from typing import Any, Sequence

from quebic_spark.codec import PLAIN, Codec, codec_of
from quebic_spark.errors import (
    FormatException,
    IncompatibleSchemaException,
)
from quebic_spark.schema import (
    BINARY,
    INTEGER,
    REAL,
    TENSOR,
    TEXT,
    Schema,
)
from quebic_spark.tensor import Tensor


def serialize_record(
    schema: Schema, values: Sequence[Any], codec: Codec = PLAIN
) -> bytes:
    """Validate + pack one record (arity/type errors raise
    IncompatibleSchemaException, parity with Schema.scala:22-31)."""
    record = schema.validate_record(values)
    out = bytearray()
    for v, t in zip(record, schema.types):
        if t is INTEGER:
            out += struct.pack(">q", v)
        elif t is REAL:
            out += struct.pack(">d", v)
        elif t is TEXT:
            try:
                b = v.encode("utf-8")
            except UnicodeEncodeError as e:
                # lone surrogates pass isinstance(str) validation but
                # have no UTF-8 encoding — keep the taxonomy instead
                # of leaking UnicodeEncodeError after a successful
                # validate (r14 review)
                raise IncompatibleSchemaException(
                    f"TEXT value is not UTF-8-encodable: {e}"
                ) from e
            if len(b) >= 2**32:
                # the 4-byte length prefix cannot frame it; loud
                # domain error instead of a leaked struct.error
                # (r16 review)
                raise IncompatibleSchemaException(
                    f"TEXT value of {len(b)} UTF-8 bytes exceeds the "
                    f"4 GiB record field format"
                )
            out += struct.pack(">I", len(b)) + b
        elif t is BINARY:
            if len(v) >= 2**32:
                raise IncompatibleSchemaException(
                    f"BINARY value of {len(v)} bytes exceeds the "
                    f"4 GiB record field format"
                )
            out += struct.pack(">I", len(v)) + v
        elif t is TENSOR:
            shape, vals = v
            out += struct.pack(">I", len(shape))
            out += struct.pack(f">{len(shape)}i", *shape)
            out += struct.pack(f">{len(vals)}d", *vals)
    return codec.encode(bytes(out))


def deserialize_record(
    schema: Schema, data: bytes, codec: Codec = PLAIN
) -> tuple[Any, ...]:
    """Unpack one record; trailing garbage, short reads, and
    undecodable codec payloads raise FormatException (parity with
    JournaledFile.scala:367-393 and the deserialization-failure wrap
    at consume():203-210)."""
    try:
        raw = codec.decode(data)
    except Exception as e:  # noqa: BLE001 — corrupt gzip container:
        # BadGzipFile/zlib.error are OS-level types, the contract is a
        # domain error (r10 corruption-sweep catch)
        raise FormatException(
            f"record undecodable with {codec.name}: "
            f"{type(e).__name__}: {e}"
        ) from e
    off = 0
    out: list[Any] = []

    def need(n: int) -> None:
        if off + n > len(raw):
            raise FormatException(
                f"short read at offset {off}: need {n}, have {len(raw) - off}"
            )

    for t in schema.types:
        if t is INTEGER:
            need(8)
            out.append(struct.unpack_from(">q", raw, off)[0])
            off += 8
        elif t is REAL:
            need(8)
            out.append(struct.unpack_from(">d", raw, off)[0])
            off += 8
        elif t is TEXT:
            need(4)
            n = struct.unpack_from(">I", raw, off)[0]
            off += 4
            need(n)
            try:
                out.append(raw[off : off + n].decode("utf-8"))
            except UnicodeDecodeError as e:
                # corrupt TEXT bytes are a domain error, same contract
                # as the short-read/codec paths (r14 review:
                # UnicodeDecodeError escaped to callers that catch
                # FormatException to quarantine corrupt records)
                raise FormatException(
                    f"undecodable TEXT at offset {off}: {e}"
                ) from e
            off += n
        elif t is BINARY:
            need(4)
            n = struct.unpack_from(">I", raw, off)[0]
            off += 4
            need(n)
            out.append(raw[off : off + n])
            off += n
        elif t is TENSOR:
            need(4)
            ndim = struct.unpack_from(">I", raw, off)[0]
            off += 4
            need(4 * ndim)
            shape = list(struct.unpack_from(f">{ndim}i", raw, off))
            off += 4 * ndim
            n_vals = 1
            for s in shape:
                # dims are signed on the wire: a negative dim (corrupt
                # or crafted input) would make n_vals negative, letting
                # need() pass and struct raise the wrong error type —
                # keep the FormatException contract. The product cannot
                # wrap (Python ints) and need() bounds the allocation,
                # so non-negativity is the only extra invariant.
                if s < 0:
                    raise FormatException(
                        f"negative tensor dim {s} in shape {shape}"
                    )
                n_vals *= s
            need(8 * n_vals)
            vals = list(struct.unpack_from(f">{n_vals}d", raw, off))
            off += 8 * n_vals
            try:
                out.append(Tensor(shape, vals).as_row())
            except ValueError as e:
                # ndim=0 with values (empty-product n_vals == 1) and
                # any other constructor-level inconsistency from
                # corrupt/crafted bytes stays a FormatException (r14
                # review — the negative-dim guard above missed this)
                raise FormatException(
                    f"invalid tensor payload shape={shape}: {e}"
                ) from e
    if off != len(raw):
        raise FormatException(
            f"record over-run: {len(raw) - off} trailing bytes"
        )
    return tuple(out)


def serialize_framed(
    schema: Schema, values: Sequence[Any], codec: Codec = PLAIN
) -> bytes:
    """Pack one record with a leading codec-id byte (the reference's
    per-entry codec field, JournaledFile.scala:322): the blob carries
    its own decompression recipe."""
    if not 0 <= codec.id <= 0xFF:
        raise FormatException(f"codec id {codec.id} not a byte")
    return bytes([codec.id]) + serialize_record(schema, values, codec)


def deserialize_framed(schema: Schema, data: bytes) -> tuple[Any, ...]:
    """Unpack a framed record, selecting the codec from its first byte.
    Unknown codec ids raise FormatException (corrupt or foreign data —
    same contract as the body parser)."""
    if len(data) < 1:
        raise FormatException("framed record shorter than its header")
    try:
        codec = codec_of(data[0])
    except ValueError as e:
        raise FormatException(str(e)) from None
    return deserialize_record(schema, bytes(data[1:]), codec)
