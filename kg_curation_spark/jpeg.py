"""Baseline JPEG decoder — pure python/numpy, no codec libraries.

Scope (the overwhelmingly common archival case): baseline sequential DCT
(SOF0), 8-bit samples, 1 (grayscale) or 3 (YCbCr) components, any
sampling factors dividing the frame maxima (4:4:4, 4:2:2, 4:2:0, …),
restart markers honored. Progressive (SOF2), arithmetic coding,
hierarchical and 12-bit modes raise NotImplementedError — those need a
real codec library.

Used by multimodal.decode_media for ``image/jpeg`` payloads. The
bit-by-bit entropy decoder is the honest trade-off of a library-free
fallback: correct and deterministic, not fast — at scale the decode UDF
is where PIL/libjpeg-turbo would drop in unchanged (multimodal.py module
docstring), while everything Spark-side (schema, batching, dispatch)
stays identical.

Implements ITU-T T.81 Annex C (canonical Huffman code generation from
BITS/HUFFVAL), F.2.2.1 (DC prediction + EXTEND), F.2.2.2 (AC run-length)
and A.3.3 (IDCT orientation: F[v][u] with u the horizontal frequency).
"""

from __future__ import annotations

import numpy as np

# zigzag index -> (row v, col u) in the 8x8 block, per T.81 Figure A.6
ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _rng = range(min(_s, 7), max(0, _s - 7) - 1, -1) if _s % 2 == 0 else range(
        max(0, _s - 7), min(_s, 7) + 1
    )
    ZIGZAG.extend((v, _s - v) for v in _rng)

# orthonormal 8-point DCT basis: A[k, n] = c(k)/2 * cos((2n+1) k pi / 16)
_A = np.array(
    [
        [
            (np.sqrt(0.5) if k == 0 else 1.0) / 2.0 * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def idct_8x8(block: np.ndarray) -> np.ndarray:
    """block[v][u] frequency -> spatial[y][x] (no level shift)."""
    return _A.T @ block @ _A


def fdct_8x8(block: np.ndarray) -> np.ndarray:
    """Inverse of idct_8x8 — used by the test encoder."""
    return _A @ block @ _A.T


def build_huffman_codes(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """Annex C canonical code generation: (code_length, code) -> symbol."""
    codes: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at any other marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.buf = 0
        self.nbits = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _decode_huffman(r: _BitReader, codes: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = codes.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map t received bits to the signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """-> (h, w, 3) uint8 RGB (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(comp_id, Hc, Vc, tq)])
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables need a codec lib")
                tbl = np.zeros((8, 8))
                for i, (v, u) in enumerate(ZIGZAG):
                    tbl[v, u] = seg[p + 1 + i]
                qt[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                huff[(tc, th)] = build_huffman_codes(
                    bits, list(seg[p + 17 : p + 17 + cnt])
                )
                p += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(+ext seq)
            if seg[0] != 8:
                raise NotImplementedError("12-bit JPEG needs a codec lib")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            comps = []
            for i in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/arithmetic/hierarchical JPEG needs a codec lib"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            scan = []
            for i in range(seg[0]):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 15))
            return _decode_scan(
                payload, pos + seglen, frame, scan, qt, huff, restart_interval
            )
        pos += seglen
    raise ValueError("JPEG truncated: no SOS segment")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w, comps = frame
    if len(scan) not in (1, 3):
        raise NotImplementedError("unsupported JPEG component count")
    if len(scan) != len(comps):
        # a legal baseline file may carry one SOS per component; decoding
        # only the first scan would silently return grayscale-replicated Y
        # for a color image — fail loudly like the progressive path does
        raise NotImplementedError(
            "multi-scan (non-interleaved) baseline JPEG not supported"
        )
    by_id = {cid: (hc, vc, tq) for cid, hc, vc, tq in comps}
    hmax = max(hc for _, hc, _, _ in comps)
    vmax = max(vc for _, _, vc, _ in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes = {}
    for cs, _, _ in scan:
        hc, vc, _ = by_id[cs]
        planes[cs] = np.zeros((mcus_y * vc * 8, mcus_x * hc * 8))

    r = _BitReader(data, pos)
    pred = {cs: 0 for cs, _, _ in scan}
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.align()
                try:
                    r._fill()
                    raise ValueError("JPEG expected restart marker")
                except _MarkerHit as m:
                    if not 0xFFD0 <= m.marker <= 0xFFD7:
                        raise ValueError("JPEG expected restart marker") from m
                # _fill raised with pos still AT the 0xFF — skip the marker
                r = _BitReader(data, r.pos + 2)
                pred = {cs: 0 for cs in pred}
            for cs, td, ta in scan:
                hc, vc, tq = by_id[cs]
                for by in range(vc):
                    for bx in range(hc):
                        coef = np.zeros((8, 8))
                        t = _decode_huffman(r, huff[(0, td)])
                        diff = _extend(r.bits(t), t)
                        pred[cs] += diff
                        coef[0, 0] = pred[cs]
                        k = 0
                        while k < 63:
                            rs = _decode_huffman(r, huff[(1, ta)])
                            rr, ss = rs >> 4, rs & 15
                            if ss == 0:
                                if rr == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr + 1
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            v, u = ZIGZAG[k]
                            coef[v, u] = _extend(r.bits(ss), ss)
                        spatial = idct_8x8(coef * qt[tq]) + 128.0
                        y0 = (my * vc + by) * 8
                        x0 = (mx * hc + bx) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu += 1

    out = []
    for cs, _, _ in scan:
        hc, vc, _ = by_id[cs]
        p = planes[cs]
        if hc != hmax or vc != vmax:
            p = np.repeat(np.repeat(p, vmax // vc, axis=0), hmax // hc, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        rgb = np.stack([out[0]] * 3, axis=2)
    else:
        y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
        rgb = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=2,
        )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
