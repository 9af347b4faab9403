"""Pure-numpy baseline-sequential JPEG (JFIF) decoder.

Closes the last image-modality seam in ``multimodal.builtin_decoder``
(r5 verdict item #8): the sandbox has no PIL/libjpeg, so the decoder is
implemented from the public ITU-T T.81 spec — marker parse (DQT / SOF0
/ DHT / DRI / SOS), canonical huffman entropy decode with 0xFF00
byte-unstuffing and restart-marker resync, DC prediction, zigzag +
dequantization, float IDCT (two 8x8 matmuls per block), chroma
upsampling for 4:2:0/4:2:2, and BT.601 YCbCr→RGB. Output matches the
other builtin image decoders' convention: float64 grayscale in [0,1]
(mean of RGB for color payloads, Y for grayscale payloads).

Scope: baseline and extended-sequential huffman (SOF0/SOF1) — the
format ~all web JPEGs use. Progressive (SOF2), hierarchical and
arithmetic-coded variants raise ``NotImplementedError`` with the
``register_decoder`` escape hatch named; a production cluster installs
libjpeg-turbo behind the same seam rather than decoding progressive
scans in numpy.

The per-block cost is two 8x8 float matmuls plus a python huffman walk
— fine for the corpus-stats path this feeds (media_stats /
extract_features pool the image immediately); it is NOT a
pixel-throughput codec, by design (the seam exists for that).

Tested against an independent encoder in tests/test_dataops.py (its
own DCT/huffman/quant tables from the spec's Annex K), including
subsampled color, restart intervals and corruption rejection.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index z in scan order -> raster index (ITU-T T.81
# figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.intp)

# orthonormal 8x8 DCT-II basis: spatial = C.T @ coeffs @ C
_C = np.zeros((8, 8))
for _u in range(8):
    _cu = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _Huff:
    """Canonical huffman table from a DHT segment: code -> symbol,
    decoded MSB-first one bit at a time (images here are corpus
    samples, not a pixel pipeline — clarity over table lookups)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.map: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.map[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("restart marker inside entropy segment "
                                 "(restart interval mismatch)")
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside scan")
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        return v

    def read_symbol(self, table: _Huff) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in scan")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        self.bits = 0
        if self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    return v - ((1 << s) - 1) if v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline/extended-sequential huffman JFIF blob to a
    float64 grayscale array in [0,1] (see module docstring)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None        # (h, w, comps) from SOF
    restart_interval = 0
    scan = None         # per-comp (dc_id, ac_id) from SOS
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:                       # fill byte (T.81 B.1.1.2):
            pos += 1                             # markers may be 0xFF-padded
            continue
        if marker == 0xD9:                       # EOI before any scan
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:                       # DQT (may hold several)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.float64)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.float64)
                    i += 64
                table = np.zeros(64)
                table[ZIGZAG] = vals             # stored in zigzag order
                qt[tq] = table.reshape(8, 8)
        elif marker in (0xC0, 0xC1):             # SOF0/1: sequential huffman
            if seg[0] != 8:                      # SOF1 permits 12-bit samples
                raise NotImplementedError(
                    f"{seg[0]}-bit sample precision — the baseline decoder "
                    "handles 8-bit only; register_decoder() a full codec")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            if ncomp == 1:                       # single-comp scans use 8x8 blocks
                comps[0]["h"] = comps[0]["v"] = 1
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF 0xFF{marker:02X} (progressive/hierarchical/"
                "arithmetic) is outside the baseline decoder — "
                "register_decoder() a full codec for these")
        elif marker == 0xC4:                     # DHT (may hold several)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                nsym = sum(counts)
                tbl = _Huff(counts, seg[i + 17:i + 17 + nsym])
                (huff_ac if tc else huff_dc)[th] = tbl
                i += 17 + nsym
        elif marker == 0xDD:                     # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                     # SOS: scan follows
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tables >> 4, tables & 15)
            pos = pos + 2 + seglen
            break
        # APPn / COM / anything else: skip
        pos = pos + 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF or SOS")

    h, w, comps = frame
    if any(c["id"] not in scan for c in comps):
        # legal baseline variant: several single-component (Ns=1) scans
        # instead of one interleaved scan — out of this decoder's scope
        raise NotImplementedError(
            "multi-scan (non-interleaved) baseline JPEG — this decoder "
            "handles one interleaved scan; register_decoder() a full codec")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps]

    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, comp in enumerate(comps):
                dc_t = huff_dc[scan[comp["id"]][0]]
                ac_t = huff_ac[scan[comp["id"]][1]]
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64)
                        s = reader.read_symbol(dc_t)
                        diff = _extend(reader.read(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(ac_t)
                            if rs == 0x00:       # EOB
                                break
                            if rs == 0xF0:       # ZRL: 16 zeros
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read(rs & 15), rs & 15)
                            k += 1
                        coeffs = np.zeros(64)
                        coeffs[ZIGZAG] = zz
                        block = _C.T @ (coeffs.reshape(8, 8) * q) @ _C + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block

    # crop to component size, upsample to full resolution
    full = []
    for ci, comp in enumerate(comps):
        ch = -(-h * comp["v"] // vmax)
        cw = -(-w * comp["h"] // hmax)
        p = planes[ci][:ch, :cw]
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0),
                      hmax // comp["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255) / 255.0
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG (CMYK?) "
                                  "needs a registered decoder")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255)
    return rgb.mean(axis=2) / 255.0
