"""Baseline JPEG codec in pure stdlib + numpy.

The container has no PIL/libjpeg, so the multimodal decode tier
(`operators/multimodal.py`) implements formats at the byte level.
This module adds baseline sequential DCT JPEG (ITU T.81): marker
walk, DQT/DHT/SOF0/SOS/DRI parsing, entropy decode with byte
unstuffing and restart markers, dequantize + dezigzag, orthonormal
IDCT via a numpy DCT-III matrix product, chroma upsampling, and
BT.601 YCbCr->RGB. Progressive (SOF2), arithmetic coding, and 12-bit
precision raise ValueError — `decode_media` quarantines those rows
as ``jpeg-error-stub`` (same contract as the other decoders).

`encode_jpeg` is the test-support twin (like `encode_bmp` /
`encode_png`): FDCT + quantize + huffman encode, writing its quant
and huffman tables INTO the stream — the decoder trusts only what it
parses from the file, so a round-trip exercises the real
table-driven path, not a shared constant.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order: index i of the scan -> (row, col) flattened index
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT matrix: C[k, n] = s(k) * cos((2n+1) k pi / 16);
# IDCT(block) = C.T @ block @ C, FDCT(block) = C @ block @ C.T
_C = np.array([
    [
        (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
        * np.cos((2 * n + 1) * k * np.pi / 16)
        for n in range(8)
    ]
    for k in range(8)
])


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with FF00
    unstuffing and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1s past the end (spec: decoder may read
                # beyond the last byte while finishing the final MCU)
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker sits at a byte boundary; the MCU
                    # loop consumes it via expect_restart()
                    self.bits = (self.bits << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    # EOI or next segment: stop consuming
                    self.bits = (self.bits << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            # mask consumed bits OUT of the accumulator: without this
            # it grows into an ever-larger bigint and entropy decode
            # goes quadratic in scan size (measured 31s -> 0.5s on a
            # 256x256 noise image)
            self.bits &= (1 << self.nbits) - 1
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def expect_restart(self) -> None:
        """Skip to the next restart marker (byte-aligned FFD0-FFD7)."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _build_huffman(bits: list[int], values: list[int]) -> dict:
    """Canonical JPEG huffman table: (length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> dict:
    """Decode baseline JPEG; returns the decode_media metadata dict
    (geometry + full-pixel mean)."""
    meta, _px = decode_jpeg_pixels(payload)
    return meta


def decode_jpeg_pixels(payload: bytes) -> tuple[dict, np.ndarray]:
    """Full decode: ``(metadata, pixels)`` where pixels is (h, w, 3)
    RGB float64 or (h, w) grayscale, clipped to [0, 255]."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=p + 1
                ).astype(np.float64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1: p + 17])
                n = sum(bits)
                values = list(seg[p + 17: p + 17 + n])
                table = _build_huffman(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(
                    ">BBB", seg, 6 + 3 * i
                )
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append(
                    {"cs": cs, "td": tables >> 4, "ta": tables & 0xF}
                )
            pos += seglen
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    if len(scan) != len(frame["comps"]):
        # legal baseline streams may split components across several
        # non-interleaved scans; this decoder handles the (dominant)
        # single interleaved scan only — anything else must quarantine
        # rather than emit planes that were never scanned
        raise ValueError(
            f"non-interleaved multi-scan JPEG unsupported "
            f"({len(scan)} of {len(frame['comps'])} components in SOS)"
        )

    comps = frame["comps"]
    # geometry sanity cap: a corrupted SOF can claim 65535x65535 and
    # turn one bad row into a multi-GB allocation in the executor —
    # the quarantine contract wants a ValueError, not an OOM. The cap
    # prices the REAL peak (3 float64 planes + the upsampled RGB
    # stack ~ 7 doubles/pixel ≈ 56 B/px -> 4M px ≈ 230 MB); raise it
    # alongside a chunked decode if a pipeline needs wall-size images
    if frame["w"] * frame["h"] > 4_000_000:
        raise ValueError(
            f"implausible geometry {frame['w']}x{frame['h']}"
        )
    if not all(
        1 <= c["h"] <= 4 and 1 <= c["v"] <= 4 for c in comps
    ):
        raise ValueError("invalid sampling factors")
    _hm = max(c["h"] for c in comps)
    _vm = max(c["v"] for c in comps)
    if not all(
        _hm % c["h"] == 0 and _vm % c["v"] == 0 for c in comps
    ):
        # T.81 permits non-divisor factors (e.g. 3 vs max 4) but the
        # integer-repeat upsampler below would silently emit wrong
        # chroma for them — quarantine instead (review catch); every
        # mainstream subsampling (4:4:4/4:2:2/4:2:0/4:1:1) divides
        raise ValueError("non-divisor sampling factors unsupported")
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-frame["w"] // mcu_w)
    mcus_y = -(-frame["h"] // mcu_h)

    planes = {
        c["id"]: np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
            dtype=np.float64,
        )
        for c in comps
    }
    reader = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and n_mcu
                and n_mcu % restart_interval == 0
            ):
                reader.expect_restart()
                pred = {c["id"]: 0 for c in comps}
            n_mcu += 1
            for sc in scan:
                c = by_id[sc["cs"]]
                dc_tab = huff_dc[sc["td"]]
                ac_tab = huff_ac[sc["ta"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        t = _huff_decode(reader, dc_tab)
                        diff = _extend(reader.read_bits(t), t)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = zz * q
                        px = _C.T @ block.reshape(8, 8) @ _C
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][
                            y0:y0 + 8, x0:x0 + 8
                        ] = px + 128.0

    w, h = frame["w"], frame["h"]
    if len(comps) == 1:
        out_px = np.clip(planes[comps[0]["id"]][:h, :w], 0, 255)
        mean = float(out_px.mean()) if out_px.size else 0.0
        channels = 1
    elif len(comps) == 3:
        full = []
        for c in comps:
            plane = planes[c["id"]]
            # nearest-neighbor upsample to full resolution
            plane = plane.repeat(vmax // c["v"], axis=0).repeat(
                hmax // c["h"], axis=1
            )
            full.append(plane[:h, :w])
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out_px = np.clip(np.stack([r, g, b], axis=-1), 0, 255)
        mean = float(out_px.mean()) if out_px.size else 0.0
        channels = 3
    else:
        raise ValueError(f"unsupported component count {len(comps)}")
    return {
        "fmt": "jpeg",
        "width": w,
        "height": h,
        "n_frames": 1,
        "sample_rate": None,
        "channels": channels,
        "mean_value": mean,
    }, out_px


# ---------------------------------------------------------------------------
# test-support encoder
# ---------------------------------------------------------------------------

# Annex-K luminance quant table (quality 50); chroma uses a flat table
# — any tables are legal, the decoder reads them from the DQT segment
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
QUANT_CHROMA = np.full(64, 24.0)

# encoder huffman tables: every symbol we can emit gets an 8-bit
# canonical code (12 DC categories + 162 AC run/size symbols = 174
# codes of length 8 — valid since 174 < 2^8, and written to DHT so
# the decoder exercises its real table parser)
_DC_SYMS = list(range(12))
_AC_SYMS = sorted(
    {0x00, 0xF0}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)


def _enc_table(symbols: list[int]) -> tuple[list[int], dict]:
    bits = [0] * 16
    bits[7] = len(symbols)  # all codes length 8
    codes = {sym: (8, i) for i, sym in enumerate(symbols)}
    return bits, codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(
    wtr: _BitWriter, block: np.ndarray, q: np.ndarray,
    pred: int, dc_codes: dict, ac_codes: dict,
) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    zz = np.round(coef.flatten()[ZIGZAG] / q[ZIGZAG]).astype(np.int64)
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    ln, code = dc_codes[t]
    wtr.write(code, ln)
    if t:
        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            wtr.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_codes[(run << 4) | s]
        wtr.write(code, ln)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = ac_codes[0x00]
        wtr.write(code, ln)
    return dc


def encode_jpeg(
    rgb: np.ndarray,
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 array (or (h, w) when ``grayscale``)
    as baseline 4:4:4 JPEG; ``restart_interval`` > 0 emits DRI + RSTn
    markers every N MCUs (exercises the decoder's restart path).
    Test-support: correctness over speed."""
    rgb = np.asarray(rgb, dtype=np.float64)
    if grayscale:
        h, w = rgb.shape
        planes = [rgb]
        comps = [(1, 0)]  # (component id, quant table id)
    else:
        h, w = rgb.shape[:2]
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        comps = [(1, 0), (2, 1), (3, 1)]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1:h, :]
        pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp)

    dc_bits, dc_codes = _enc_table(_DC_SYMS)
    ac_bits, ac_codes = _enc_table(_AC_SYMS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    # T.81 stores DQT entries in ZIGZAG order: element k of the
    # segment quantizes scan position k, not natural index k (review
    # catch: natural-order bytes made the decoder dequantize most AC
    # coefficients with the wrong quantizer — ~2x error on noise)
    out += seg(
        0xDB,
        bytes([0x00]) + bytes(QUANT_LUMA[ZIGZAG].astype(np.uint8)),
    )
    out += seg(
        0xDB,
        bytes([0x01]) + bytes(QUANT_CHROMA[ZIGZAG].astype(np.uint8)),
    )
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, tq in comps:
        sof += struct.pack(">BBB", cid, 0x11, tq)  # 4:4:4 (1x1)
    out += seg(0xC0, sof)
    for tc in (0, 1):  # DC then AC table, both id 0
        bits, syms = (dc_bits, _DC_SYMS) if tc == 0 else (
            ac_bits, _AC_SYMS
        )
        out += seg(
            0xC4, bytes([tc << 4]) + bytes(bits) + bytes(syms)
        )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _tq in comps:
        sos += struct.pack(">BB", cid, 0x00)  # DC/AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    wtr = _BitWriter()
    quant = {0: QUANT_LUMA, 1: QUANT_CHROMA}
    pred = [0] * len(comps)
    n_mcu = 0
    rst = 0
    for my in range(ph // 8):
        for mx in range(pw // 8):
            if (
                restart_interval
                and n_mcu
                and n_mcu % restart_interval == 0
            ):
                wtr.flush()
                out += wtr.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                wtr = _BitWriter()
                pred = [0] * len(comps)
            n_mcu += 1
            for i, ((_cid, tq), plane) in enumerate(
                zip(comps, padded)
            ):
                block = plane[
                    my * 8:my * 8 + 8, mx * 8:mx * 8 + 8
                ]
                pred[i] = _encode_block(
                    wtr, block, quant[tq], pred[i],
                    dc_codes, ac_codes,
                )
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
