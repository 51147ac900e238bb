"""Baseline + progressive JPEG codec in pure stdlib + numpy.

The container has no PIL/libjpeg, so the multimodal decode tier
(`operators/multimodal.py`) implements formats at the byte level.
This module implements ITU T.81 DCT JPEG: marker walk,
DQT/DHT/SOF/SOS/DRI parsing, entropy decode with byte unstuffing and
restart markers, dequantize + dezigzag, orthonormal IDCT via a numpy
DCT-III matrix product, chroma upsampling, and BT.601 YCbCr->RGB.

Both frame types decode through one coefficient-store architecture
(r7): every scan — the single interleaved baseline scan, or a
progressive (SOF2) sequence of DC-first / DC-refine / AC-first /
AC-refine spectral-selection + successive-approximation scans (T.81
Annex G, incl. EOB-run coding and AC correction bits) — accumulates
quantized coefficients per component block; dequantize + IDCT +
color-convert run once at EOI. Arithmetic coding, 12-bit precision,
and baseline non-interleaved multi-scan layouts raise ValueError —
`decode_media` quarantines those rows as ``jpeg-error-stub`` (same
contract as the other decoders).

`encode_jpeg` / `encode_jpeg_progressive` are the test-support twins
(like `encode_bmp` / `encode_png`): FDCT + quantize + huffman encode,
writing quant and huffman tables INTO the stream — the decoder trusts
only what it parses from the file, so round-trips exercise the real
table-driven paths; the progressive encoder emits the full scan
repertoire (interleaved DC first + refine, per-component AC first
with accumulated EOB runs + AC refine with correction bits).
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


def _wrap_i32(v: int) -> int:
    """Two's-complement int32 wrap. A fuzzed Huffman table can carry a
    DC category symbol far past the legal 11, so the running DC
    prediction is an unbounded Python int; storing it raw into the
    int32 coefficient array wraps silently on NumPy 1.x but raises on
    NumPy 2.x. Wrapping explicitly pins one behavior on both."""
    return ((v + 0x8000_0000) & 0xFFFF_FFFF) - 0x8000_0000


def decode_jpeg(payload: bytes) -> dict:
    """Decode baseline JPEG; returns the decode_media metadata dict
    (geometry + full-pixel mean)."""
    meta, _px = decode_jpeg_pixels(payload)
    return meta


def decode_jpeg_pixels(payload: bytes) -> tuple[dict, np.ndarray]:
    """Full decode: ``(metadata, pixels)`` where pixels is (h, w, 3)
    RGB float64 or (h, w) grayscale, clipped to [0, 255]. Baseline
    (SOF0) and progressive (SOF2) frames share one coefficient-store
    pipeline: scans fill per-component quantized-coefficient arrays,
    and dequantize/IDCT/color-convert run once at end of image.

    Raises ValueError on any malformed payload — the module's
    quarantine contract. Truncated segments used to escape it as
    struct.error/IndexError from the byte parsing (r15 review, the
    same defect class as the r13 KeyError fix); they are converted at
    this boundary because every index/unpack below operates on the
    hostile payload, never on trusted state."""
    try:
        return _decode_jpeg_pixels(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(
            f"truncated or corrupt JPEG segment: {e}"
        ) from e


def _decode_jpeg_pixels(payload: bytes) -> tuple[dict, np.ndarray]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    coef: dict[int, np.ndarray] = {}
    geom: dict = {}
    n_scans = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:
            # 0xFF fill byte before a marker (T.81 B.1.1.2): consume
            # one byte and re-read — never treat 0xFF as a marker code
            pos += 1
            continue
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
        elif marker == 0xC4:  # DHT (may be redefined between scans)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1: p + 17])
                n = sum(bits)
                values = list(seg[p + 17: p + 17 + n])
                table = _build_huffman(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
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
            # geometry sanity cap: a corrupted SOF can claim
            # 65535x65535 and turn one bad row into a multi-GB
            # allocation in the executor — the quarantine contract
            # wants a ValueError, not an OOM
            if w * h > 4_000_000:
                raise ValueError(f"implausible geometry {w}x{h}")
            if not all(
                1 <= c["h"] <= 4 and 1 <= c["v"] <= 4 for c in comps
            ):
                raise ValueError("invalid sampling factors")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if not all(
                hmax % c["h"] == 0 and vmax % c["v"] == 0
                for c in comps
            ):
                # T.81 permits non-divisor factors but the integer-
                # repeat upsampler would silently emit wrong chroma —
                # quarantine instead (review catch)
                raise ValueError(
                    "non-divisor sampling factors unsupported"
                )
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            geom = {"hmax": hmax, "vmax": vmax,
                    "mcus_x": mcus_x, "mcus_y": mcus_y}
            for c in comps:
                # MCU-padded grid (interleaved scans write pad
                # blocks); non-interleaved scans iterate the true
                # component grid, a prefix of this one
                coef[c["id"]] = np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64),
                    dtype=np.int32,
                )
                c["bw"] = -(-(-(-w * c["h"] // hmax)) // 8)
                c["bh"] = -(-(-(-h * c["v"] // vmax)) // 8)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — decode this scan's data
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            by_id = {c["id"]: c for c in frame["comps"]}
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                if cs not in by_id:
                    raise ValueError(f"SOS names unknown component {cs}")
                scan.append(
                    {"c": by_id[cs], "td": tables >> 4,
                     "ta": tables & 0xF}
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if progressive:
                if ss == 0 and se != 0:
                    # a baseline-shaped full-band scan inside a SOF2
                    # frame is illegal (T.81 G.1: DC scans have Se=0)
                    raise ValueError(
                        "invalid progressive scan (Ss=0 with Se>0)"
                    )
                if ss > 0 and ns != 1:
                    raise ValueError(
                        "progressive AC scan must be single-component"
                    )
                if se > 63 or ss > se:
                    raise ValueError("bad spectral selection")
            else:
                if ns != len(frame["comps"]):
                    # legal baseline streams may split components
                    # across several non-interleaved scans; this
                    # decoder handles the (dominant) single
                    # interleaved scan only — anything else must
                    # quarantine rather than emit planes that were
                    # never scanned
                    raise ValueError(
                        f"non-interleaved multi-scan JPEG unsupported "
                        f"({ns} of {len(frame['comps'])} components "
                        f"in SOS)"
                    )
            pos += seglen
            reader = _BitReader(payload, pos)
            _decode_scan_data(
                reader, scan, coef, geom, huff_dc, huff_ac,
                restart_interval, progressive, ss, se, ah, al,
            )
            n_scans += 1
            # resync to the next marker (the reader stops consuming
            # at any non-stuffing, non-restart FF). payload[p+1] must
            # also not be 0xFF: a run of FF bytes before a marker is
            # legal fill (T.81 B.1.1.2) — stopping on the FIRST fill
            # FF would hand the main loop marker=0xFF, whose next two
            # bytes (the real marker) then parse as a bogus segment
            # length and the remaining scans are silently skipped
            # (r7 review catch: 'FF FF DA' returned a partial image)
            p = reader.pos
            while p + 1 < len(payload) and not (
                payload[p] == 0xFF
                and payload[p + 1] != 0x00
                and payload[p + 1] != 0xFF
                and not (0xD0 <= payload[p + 1] <= 0xD7)
            ):
                p += 1
            pos = p
            continue
        pos += seglen
    if frame is None or n_scans == 0:
        raise ValueError("missing SOF/SOS")

    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax, vmax = geom["hmax"], geom["vmax"]
    planes = {}
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(
                f"undefined quantization table {c['tq']}"
            )
        q = qt[c["tq"]]
        zz = coef[c["id"]].astype(np.float64) * q[None, None, :]
        nby, nbx = zz.shape[:2]
        nat = np.zeros((nby, nbx, 64))
        nat[..., ZIGZAG] = zz
        blocks = nat.reshape(nby, nbx, 8, 8)
        px = np.einsum("ab,yxbc,cd->yxad", _C.T, blocks, _C)
        planes[c["id"]] = (
            px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        )

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


def _decode_scan_data(
    reader, scan, coef, geom, huff_dc, huff_ac,
    restart_interval, progressive, ss, se, ah, al,
):
    """Entropy-decode one scan into the coefficient store.

    Baseline: the single interleaved DC+AC scan. Progressive (T.81
    Annex G): DC first (diff huffman, values << Al), DC refine (one
    appended bit per block), AC first (spectral band with EOB-run
    coding), AC refine (correction bits for history-nonzero
    coefficients + newly-significant +-1 values). EOB runs and DC
    predictors reset at restart markers."""
    # T.81 A.2: a scan is interleaved iff it carries MORE THAN ONE
    # component — baseline or progressive alike. A single-component
    # BASELINE scan traverses the component's own block grid, not the
    # MCU-padded one; routing it through the MCU path desynced the
    # entropy stream whenever the lone component had sampling factors
    # > 1 (legal grayscale; r13 review).
    interleaved = len(scan) > 1
    # table references must fail as the documented ValueError, not a
    # raw KeyError, so direct callers filtering on the module's
    # quarantine contract keep working (r13 review, reproduced by
    # stripping DHT segments)
    for sc in scan:
        needs_dc = (not progressive) or (ss == 0 and ah == 0)
        needs_ac = (not progressive) or ss > 0
        if needs_dc and sc["td"] not in huff_dc:
            raise ValueError(f"undefined DC huffman table {sc['td']}")
        if needs_ac and sc["ta"] not in huff_ac:
            raise ValueError(f"undefined AC huffman table {sc['ta']}")
    pred = {sc["c"]["id"]: 0 for sc in scan}
    eobrun = 0

    def check_restart(n_units: int) -> None:
        nonlocal pred, eobrun
        if (
            restart_interval
            and n_units
            and n_units % restart_interval == 0
        ):
            reader.expect_restart()
            pred = {sc["c"]["id"]: 0 for sc in scan}
            eobrun = 0

    if interleaved:
        n_mcu = 0
        for my in range(geom["mcus_y"]):
            for mx in range(geom["mcus_x"]):
                check_restart(n_mcu)
                n_mcu += 1
                for sc in scan:
                    c = sc["c"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            cf = coef[c["id"]][
                                my * c["v"] + by, mx * c["h"] + bx
                            ]
                            if not progressive:
                                pred[c["id"]] = _baseline_block(
                                    reader, huff_dc[sc["td"]],
                                    huff_ac[sc["ta"]], cf,
                                    pred[c["id"]],
                                )
                            elif ah == 0:
                                pred[c["id"]] = _dc_first_block(
                                    reader, huff_dc[sc["td"]], cf,
                                    pred[c["id"]], al,
                                )
                            else:
                                _dc_refine_block(reader, cf, al)
        return

    # non-interleaved progressive scan over the component's own grid
    sc = scan[0]
    c = sc["c"]
    n_blk = 0
    for by in range(c["bh"]):
        for bx in range(c["bw"]):
            check_restart(n_blk)
            n_blk += 1
            cf = coef[c["id"]][by, bx]
            if not progressive:
                pred[c["id"]] = _baseline_block(
                    reader, huff_dc[sc["td"]], huff_ac[sc["ta"]],
                    cf, pred[c["id"]],
                )
            elif ss == 0:
                if ah == 0:
                    pred[c["id"]] = _dc_first_block(
                        reader, huff_dc[sc["td"]], cf,
                        pred[c["id"]], al,
                    )
                else:
                    _dc_refine_block(reader, cf, al)
            elif ah == 0:
                eobrun = _ac_first_block(
                    reader, huff_ac[sc["ta"]], cf, ss, se, al, eobrun
                )
            else:
                eobrun = _ac_refine_block(
                    reader, huff_ac[sc["ta"]], cf, ss, se, al, eobrun
                )


def _baseline_block(reader, dc_tab, ac_tab, cf, pred: int) -> int:
    t = _huff_decode(reader, dc_tab)
    pred = _wrap_i32(pred + _extend(reader.read_bits(t), t))
    cf[0] = pred
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
        cf[k] = _extend(reader.read_bits(s), s)
        k += 1
    return pred


def _dc_first_block(reader, dc_tab, cf, pred: int, al: int) -> int:
    t = _huff_decode(reader, dc_tab)
    pred = _wrap_i32(pred + _extend(reader.read_bits(t), t))
    cf[0] = _wrap_i32(pred << al)
    return pred


def _dc_refine_block(reader, cf, al: int) -> None:
    if reader.read_bit():
        cf[0] |= 1 << al


def _ac_first_block(reader, ac_tab, cf, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)+bits end-of-band blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run overflow")
        cf[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, ac_tab, cf, ss, se, al, eobrun) -> int:
    """T.81 G.1.2.3: correction bits for history-nonzero coefficients
    interleave with newly-significant +-1 insertions; an EOB run
    still refines the remainder of each covered block."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad AC refinement symbol")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if cf[k] != 0:
                    if reader.read_bit() and (cf[k] & p1) == 0:
                        cf[k] += p1 if cf[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0 and k <= se:
                cf[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if cf[k] != 0:
                if reader.read_bit() and (cf[k] & p1) == 0:
                    cf[k] += p1 if cf[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


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
    # EOBn symbols (r<<4, s=0) for the progressive encoder's
    # accumulated end-of-band runs; harmless extra entries for baseline
    | {r << 4 for r in range(1, 15)}
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


def _subsample_mean(p: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """fh x fv box-filter downsample with edge replication to a
    multiple of the factor first (encoder-side chroma subsampling)."""
    h, w = p.shape
    hh, ww = -(-h // fv) * fv, -(-w // fh) * fh
    pp = np.empty((hh, ww))
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1:h, :]
    pp[:, w:] = pp[:, w - 1:w]
    return pp.reshape(hh // fv, fv, ww // fh, fh).mean(axis=(1, 3))


def _quantized_blocks(
    rgb: np.ndarray, grayscale: bool, subsample: str = "444"
) -> tuple[int, int, list]:
    """Shared FDCT+quantize front end for both encoders. Returns
    (h, w, comps) where each comp dict carries its sampling factors,
    an (nby, nbx, 64) int array of zigzag-ordered quantized
    coefficients over the MCU-PADDED block grid, and the TRUE block
    grid dims (``tbw``/``tbh``) non-interleaved scans iterate —
    smaller than the padded grid exactly when the component is
    subsampled ("420" chroma)."""
    rgb = np.asarray(rgb, dtype=np.float64)
    if grayscale:
        h, w = rgb.shape
        planes = [rgb]
        spec = [(1, 0, 1, 1)]
    else:
        h, w = rgb.shape[:2]
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        if subsample == "444":
            spec = [(1, 0, 1, 1), (2, 1, 1, 1), (3, 1, 1, 1)]
        elif subsample == "420":
            spec = [(1, 0, 2, 2), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsample!r}")
    hmax = max(s[2] for s in spec)
    vmax = max(s[3] for s in spec)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    quant = {0: QUANT_LUMA, 1: QUANT_CHROMA}
    comps = []
    for (cid, tq, ch, cv), p in zip(spec, planes):
        if ch != hmax or cv != vmax:
            p = _subsample_mean(p, hmax // ch, vmax // cv)
        comp_h, comp_w = p.shape
        ph, pw = mcus_y * cv * 8, mcus_x * ch * 8
        pp = np.empty((ph, pw))
        pp[:comp_h, :comp_w] = p
        pp[comp_h:, :comp_w] = p[comp_h - 1:comp_h, :]
        pp[:, comp_w:] = pp[:, comp_w - 1:comp_w]
        q = quant[tq]
        zz = np.zeros((ph // 8, pw // 8, 64), dtype=np.int64)
        for by in range(ph // 8):
            for bx in range(pw // 8):
                block = pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coefs = _C @ (block - 128.0) @ _C.T
                zz[by, bx] = np.round(
                    coefs.flatten()[ZIGZAG] / q[ZIGZAG]
                ).astype(np.int64)
        comps.append({
            "cid": cid, "tq": tq, "h": ch, "v": cv, "zz": zz,
            "tbw": -(-comp_w // 8), "tbh": -(-comp_h // 8),
            "mcus_x": mcus_x, "mcus_y": mcus_y,
        })
    return h, w, comps


def encode_jpeg(
    rgb: np.ndarray,
    grayscale: bool = False,
    restart_interval: int = 0,
    subsample: str = "444",
) -> bytes:
    """Encode an (h, w, 3) uint8 array (or (h, w) when ``grayscale``)
    as baseline JPEG; ``restart_interval`` > 0 emits DRI + RSTn
    markers every N MCUs (exercises the decoder's restart path), and
    ``subsample="420"`` emits 2x2-subsampled chroma (multi-block
    MCUs). Test-support: correctness over speed."""
    h, w, comps = _quantized_blocks(rgb, grayscale, subsample)
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
    for c in comps:
        sof += struct.pack(
            ">BBB", c["cid"], (c["h"] << 4) | c["v"], c["tq"]
        )
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
    for c in comps:
        sos += struct.pack(">BB", c["cid"], 0x00)  # DC/AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    wtr = _BitWriter()
    quant = {0: QUANT_LUMA, 1: QUANT_CHROMA}
    pred = [0] * len(comps)
    n_mcu = 0
    rst = 0
    for my in range(comps[0]["mcus_y"]):
        for mx in range(comps[0]["mcus_x"]):
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
            for i, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = c["zz"][my * c["v"] + by, mx * c["h"] + bx]
                        pred[i] = _encode_zz_block(
                            wtr, zz, pred[i], dc_codes, ac_codes
                        )
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_zz_block(
    wtr: _BitWriter, zz: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    """Baseline entropy coding of one already-quantized zigzag block."""
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


def _emit_eobrun(wtr, ac_codes, count: int) -> int:
    """Flush an accumulated end-of-band run (T.81 G.1.2.2 EOBn);
    returns 0 (the new run length). One EOBn always suffices: the
    encoder caps the accumulated run at 0x7FFF, within EOB14's
    reach — the old multi-chunk loop and its pending-bits buffer
    were dead code no call site exercised (r15 review)."""
    if count > 0:
        r = count.bit_length() - 1
        ln, code = ac_codes[r << 4]
        wtr.write(code, ln)
        if r:
            wtr.write(count - (1 << r), r)
    return 0


def encode_jpeg_progressive(
    rgb: np.ndarray,
    grayscale: bool = False,
    subsample: str = "444",
    restart_interval: int = 0,
    dc_interleaved: bool = True,
) -> bytes:
    """Encode as progressive JPEG (SOF2) with the full scan
    repertoire: interleaved DC first (Al=1) + DC refine, then per
    component AC first (Ss=1..63, Al=1, accumulated EOB runs) + AC
    refine (Ah=1, correction bits). Quantized coefficients are
    IDENTICAL to `encode_jpeg`'s for the same ``subsample``, so both
    encodings of one image must decode to identical pixels — the
    round-trip contract the tests pin. With ``subsample="420"`` the
    DC scans iterate multi-block MCUs while the AC scans iterate each
    component's TRUE block grid (smaller than the MCU-padded grid for
    chroma) — the geometry split real progressive photos exercise.
    ``restart_interval`` > 0 emits DRI + RSTn inside every scan (per
    N MCUs in the DC scans, per N blocks in the AC scans; EOB runs
    never span a restart), and ``dc_interleaved=False`` emits one
    non-interleaved DC-first/refine scan pair per component over its
    true grid. Test-support: correctness over speed."""
    h, w, comps = _quantized_blocks(rgb, grayscale, subsample)
    mcus_y, mcus_x = comps[0]["mcus_y"], comps[0]["mcus_x"]

    dc_bits, dc_codes = _enc_table(_DC_SYMS)
    ac_bits, ac_codes = _enc_table(_AC_SYMS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xDB,
        bytes([0x00]) + bytes(QUANT_LUMA[ZIGZAG].astype(np.uint8)),
    )
    out += seg(
        0xDB,
        bytes([0x01]) + bytes(QUANT_CHROMA[ZIGZAG].astype(np.uint8)),
    )
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += struct.pack(
            ">BBB", c["cid"], (c["h"] << 4) | c["v"], c["tq"]
        )
    out += seg(0xC2, sof)
    for tc in (0, 1):
        bits, syms = (dc_bits, _DC_SYMS) if tc == 0 else (
            ac_bits, _AC_SYMS
        )
        out += seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(syms))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def sos(scan_comps: list, ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(scan_comps)])
        for cid in scan_comps:
            body += struct.pack(">BB", cid, 0x00)
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    def dc_scan_units(scan_comps):
        """Restart units for a DC scan: one MCU (interleaved) or one
        block (non-interleaved), each a list of (comp, by, bx)."""
        if len(scan_comps) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    unit = []
                    for i in scan_comps:
                        c = comps[i]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                unit.append(
                                    (i, my * c["v"] + by,
                                     mx * c["h"] + bx)
                                )
                    yield unit
        else:
            c = comps[scan_comps[0]]
            for by in range(c["tbh"]):
                for bx in range(c["tbw"]):
                    yield [(scan_comps[0], by, bx)]

    rst_state = {"n": 0}

    def maybe_restart(wtr, n_units, reset):
        """Flush + RSTn at the restart cadence; returns the writer."""
        if (
            restart_interval
            and n_units
            and n_units % restart_interval == 0
        ):
            wtr.flush()
            out.extend(wtr.out)
            out.extend(bytes([0xFF, 0xD0 + rst_state["n"] % 8]))
            rst_state["n"] += 1
            reset()
            return _BitWriter()
        return wtr

    def emit_dc_scans(scan_comps):
        nonlocal out
        # DC first, Al=1 (arithmetic shift is correct for DC: T.81
        # G.1.2.1 point transforms the signed value, matching the
        # decoder's pred << Al reconstruction)
        out += sos([comps[i]["cid"] for i in scan_comps], 0, 0, 0, 1)
        wtr = _BitWriter()
        pred = {i: 0 for i in scan_comps}
        rst_state["n"] = 0
        n_units = 0
        for unit in dc_scan_units(scan_comps):
            wtr = maybe_restart(
                wtr, n_units, lambda: pred.update({i: 0 for i in pred})
            )
            n_units += 1
            for i, by, bx in unit:
                v = int(comps[i]["zz"][by, bx, 0]) >> 1
                diff = v - pred[i]
                pred[i] = v
                t = _category(diff)
                ln, code = dc_codes[t]
                wtr.write(code, ln)
                if t:
                    wtr.write(
                        diff if diff >= 0 else diff + (1 << t) - 1, t
                    )
        wtr.flush()
        out += wtr.out

        # DC refine, Ah=1 Al=0 (one bit per block)
        out += sos([comps[i]["cid"] for i in scan_comps], 0, 0, 1, 0)
        wtr = _BitWriter()
        rst_state["n"] = 0
        n_units = 0
        for unit in dc_scan_units(scan_comps):
            wtr = maybe_restart(wtr, n_units, lambda: None)
            n_units += 1
            for i, by, bx in unit:
                wtr.write(int(comps[i]["zz"][by, bx, 0]) & 1, 1)
        wtr.flush()
        out += wtr.out

    if dc_interleaved or len(comps) == 1:
        emit_dc_scans(list(range(len(comps))))
    else:
        for i in range(len(comps)):
            emit_dc_scans([i])

    # per component: AC first (Al=1) with accumulated EOB runs, over
    # the component's TRUE block grid (non-interleaved geometry)
    for c in comps:
        out += sos([c["cid"]], 1, 63, 0, 1)
        wtr = _BitWriter()
        eob_count = 0
        rst_state["n"] = 0
        n_blk = 0
        for by in range(c["tbh"]):
            for bx in range(c["tbw"]):
                if (
                    restart_interval
                    and n_blk
                    and n_blk % restart_interval == 0
                ):
                    # EOB runs never span a restart: flush before RST
                    if eob_count:
                        eob_count = _emit_eobrun(
                            wtr, ac_codes, eob_count
                        )
                    wtr = maybe_restart(wtr, n_blk, lambda: None)
                n_blk += 1
                zz = c["zz"][by, bx]
                # T.81 G.1.2.2: AC successive approximation codes the
                # MAGNITUDE shifted toward zero (|-1| >> 1 == 0, a
                # newly-significant value for the refine scan) — an
                # arithmetic shift would code -1 as -1 here AND again
                # in the refine scan, desyncing the decoder
                hi = [
                    (1 if int(v) > 0 else -1) * (abs(int(v)) >> 1)
                    for v in zz
                ]
                last = 0
                for k in range(1, 64):
                    if hi[k]:
                        last = k
                if last == 0:
                    eob_count += 1
                    if eob_count == 0x7FFF:
                        eob_count = _emit_eobrun(
                            wtr, ac_codes, eob_count
                        )
                    continue
                if eob_count:
                    eob_count = _emit_eobrun(wtr, ac_codes, eob_count)
                run = 0
                for k in range(1, last + 1):
                    v = hi[k]
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
                if last < 63:
                    eob_count += 1
        if eob_count:
            _emit_eobrun(wtr, ac_codes, eob_count)
        wtr.flush()
        out += wtr.out

    # per component: AC refine (Ah=1, Al=0). The bit stream MIRRORS
    # the decoder's walk exactly: the symbol's zero run counts only
    # zero-HISTORY zero positions, and each history-nonzero position
    # crossed contributes its correction bit at the moment the
    # decoder's walk reaches it (including inside ZRL spans).
    for c in comps:
        out += sos([c["cid"]], 1, 63, 1, 0)
        wtr = _BitWriter()
        rst_state["n"] = 0
        n_blk = 0
        for by in range(c["tbh"]):
            for bx in range(c["tbw"]):
                wtr = maybe_restart(wtr, n_blk, lambda: None)
                n_blk += 1
                zz = [int(v) for v in c["zz"][by, bx]]
                newpos = [
                    k for k in range(1, 64) if abs(zz[k]) == 1
                ]
                k = 1
                for j in newpos:
                    r = sum(1 for t in range(k, j) if zz[t] == 0)
                    while r > 15:
                        ln, code = ac_codes[0xF0]
                        wtr.write(code, ln)
                        zs = 0
                        while zs < 16:
                            if zz[k] == 0:
                                zs += 1
                            elif abs(zz[k]) >> 1:
                                wtr.write(abs(zz[k]) & 1, 1)
                            k += 1
                        r -= 16
                    ln, code = ac_codes[(r << 4) | 1]
                    wtr.write(code, ln)
                    wtr.write(1 if zz[j] > 0 else 0, 1)
                    while k < j:
                        if abs(zz[k]) >> 1:
                            wtr.write(abs(zz[k]) & 1, 1)
                        k += 1
                    k = j + 1
                if k <= 63:
                    # EOB (run 1): the decoder's eobrun loop then
                    # consumes corrections for the remaining
                    # history-nonzero positions of this block
                    ln, code = ac_codes[0x00]
                    wtr.write(code, ln)
                    for t in range(k, 64):
                        if abs(zz[t]) >> 1:
                            wtr.write(abs(zz[t]) & 1, 1)
        wtr.flush()
        out += wtr.out

    out += b"\xff\xd9"
    return bytes(out)
