"""Baseline + progressive JPEG decoder — pure numpy + stdlib, no image
library.

Implements ITU-T T.81 DCT decoding for BOTH sequential baseline (SOF0/1)
and progressive (SOF2) streams: marker parse (DQT/DHT/SOF/DRI/SOS),
canonical Huffman entropy decode with DC prediction and AC run-length
(byte stuffing + restart markers), dequant + de-zigzag, 8×8 inverse DCT
via the orthonormal basis-matrix product, chroma upsampling for
arbitrary integer sampling factors (4:4:4 / 4:2:2 / 4:2:0), and the
JFIF YCbCr→RGB transform. Progressive streams accumulate coefficients
across scans (spectral selection Ss..Se + successive approximation
Ah/Al, interleaved DC scans, per-component AC scans with EOB-run
coding and the correction-bit refinement algorithm of T.81 §G.2 — the
same algorithm libjpeg's jdphuff implements) and reconstruct once at
EOI. Grayscale and 3-component scans; arithmetic coding, hierarchical
scans, and 12-bit precision raise ``NotImplementedError`` explicitly.

Validated in tests against ground truth this repo can derive WITHOUT an
image library: CPython's ``imghdr`` test data ships the same image as
both ``python.jpg`` and ``python.ppm`` — the PPM decodes losslessly with
``operators/multimodal._decode_ppm``, bounding the JPEG reconstruction
error of a real libjpeg-encoded file.

Scale shape: runs inside the same Arrow ``mapInPandas`` hop as the other
codecs (`operators/multimodal.decode_payload` dispatches on the SOI
marker). The entropy decode is sequential per payload by nature —
parallelism comes from the corpus (one task per batch of images), never
from inside one image.
"""

from __future__ import annotations

import struct

import numpy as np

#: zig-zag scan order: index i in the stream → position ZIGZAG[i] in the
#: row-major 8×8 block
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63])

# orthonormal 8-point DCT-II basis: spatial = A.T @ coeffs @ A
_A = np.array([[np.cos((2 * x + 1) * u * np.pi / 16)
                * (np.sqrt(0.125) if u == 0 else 0.5)
                for x in range(8)] for u in range(8)])


def _huff_table(bits: list[int], vals: bytes) -> dict:
    """Canonical Huffman: {(code_length, code): symbol}."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with JPEG byte
    stuffing (0xFF 0x00 → 0xFF); stops at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.buf, self.n = 0, 0

    def _load_byte(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2                      # stuffed 0xFF data byte
            else:
                raise EOFError("marker in entropy stream")  # RST/EOI etc.
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._load_byte()
        self.n -= 1
        return (self.buf >> self.n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for restart intervals); returns it."""
        self.buf, self.n = 0, 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        m = self.data[self.pos + 1]
        self.pos += 2
        return m


def _extend(v: int, n: int) -> int:
    """JPEG magnitude decoding: an n-bit value with MSB 0 is negative."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_huff(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(data: bytes):
    """Decode a baseline or progressive JPEG to
    (width, height, n_channels, H×W×C uint8). See module docstring for
    the supported surface."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG signature")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    coeffs: list[np.ndarray] | None = None   # per-comp (BH, BW, 64) zigzag
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        if data[i + 1] == 0xFF:     # T.81 B.1.1.2: 0xFF fill bytes may
            i += 1                  # pad before any marker — skip them,
            continue                # they are not a marker code
        m = data[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            break
        ln = struct.unpack_from(">H", data, i + 2)[0]
        seg = data[i + 4:i + 2 + ln]
        if m == 0xDB:                                           # DQT
            p = 0
            while p < len(seg):
                prec, tq = seg[p] >> 4, seg[p] & 15
                if prec:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(seg[p + 1:p + 65], np.uint8) \
                           .astype(np.int32)
                p += 65
        elif m == 0xC4:                                         # DHT
            p = 0
            while p < len(seg):
                cls, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                tbl = _huff_table(bits, seg[p + 17:p + 17 + nv])
                (huff_ac if cls else huff_dc)[th] = tbl
                p += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):                           # SOF0/1/2
            progressive = m == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = [{"id": seg[6 + 3 * k], "hs": seg[7 + 3 * k] >> 4,
                      "vs": seg[7 + 3 * k] & 15, "tq": seg[8 + 3 * k]}
                     for k in range(nc)]
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG (SOF marker 0x{m:02x}) — "
                "arithmetic/hierarchical/lossless scans not supported")
        elif m == 0xDD:                                         # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:                                         # SOS
            ns = seg[0]
            if not progressive:
                scan = {seg[1 + 2 * k]: (seg[2 + 2 * k] >> 4,
                                         seg[2 + 2 * k] & 15)
                        for k in range(ns)}
                return _decode_scan(data, i + 2 + ln, w, h, comps, scan,
                                    qt, huff_dc, huff_ac, restart_interval)
            if coeffs is None:
                hmax = max(c["hs"] for c in comps)
                vmax = max(c["vs"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                coeffs = [np.zeros((mcuy * c["vs"], mcux * c["hs"], 64),
                                   np.int32) for c in comps]
            by_id = {c["id"]: k for k, c in enumerate(comps)}
            scan_comps = [(by_id[seg[1 + 2 * k]], seg[2 + 2 * k] >> 4,
                           seg[2 + 2 * k] & 15) for k in range(ns)]
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            i = _decode_prog_scan(data, i + 2 + ln, w, h, comps,
                                  scan_comps, ss, se, ah, al, huff_dc,
                                  huff_ac, restart_interval, coeffs)
            continue
        i += 2 + ln
    if progressive and coeffs is not None:
        return _reconstruct_progressive(w, h, comps, qt, coeffs)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, w, h, comps, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * c["vs"] * 8, mcux * c["hs"] * 8), np.float64)
              for c in comps]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                m = br.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    raise ValueError(f"expected RSTn, got 0x{m:02x}")
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        blk = _decode_block(br, huff_dc[td], huff_ac[ta],
                                            q, pred, ci)
                        y0 = (my * c["vs"] + by) * 8
                        x0 = (mx * c["hs"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            mcu_count += 1
    out = []
    for c, plane in zip(comps, planes):
        up = _upsample(plane, vmax // c["vs"], hmax // c["hs"])
        out.append(up[:h, :w])
    if len(out) == 1:
        px = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[:, :, None]
        return w, h, 1, px
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _up2(p: np.ndarray, axis: int) -> np.ndarray:
    """2× 'fancy' (triangle-filter) upsample along one axis — libjpeg's
    default h2v2 kernel: each output sample is ¾·nearest + ¼·next-nearest
    input sample, edges replicated. Cuts the chroma edge bleed that plain
    sample replication leaves after 4:2:0 subsampling."""
    near = p.repeat(2, axis=axis)
    lo = np.roll(p, 1, axis=axis)
    hi = np.roll(p, -1, axis=axis)
    if axis == 0:
        lo[0], hi[-1] = p[0], p[-1]
    else:
        lo[:, 0], hi[:, -1] = p[:, 0], p[:, -1]
    other = np.empty_like(near)
    sl_even = [slice(None)] * p.ndim
    sl_odd = [slice(None)] * p.ndim
    sl_even[axis] = slice(0, None, 2)
    sl_odd[axis] = slice(1, None, 2)
    other[tuple(sl_even)] = lo
    other[tuple(sl_odd)] = hi
    return 0.75 * near + 0.25 * other


def _upsample(plane: np.ndarray, fv: int, fh: int) -> np.ndarray:
    """Chroma upsample: triangle filter for the standard 2× factors,
    sample replication for anything else."""
    if fv == 2:
        plane = _up2(plane, 0)
    elif fv != 1:
        plane = plane.repeat(fv, axis=0)
    if fh == 2:
        plane = _up2(plane, 1)
    elif fh != 1:
        plane = plane.repeat(fh, axis=1)
    return plane


def _decode_block(br, dc_tbl, ac_tbl, q, pred, ci):
    coeffs = np.zeros(64, np.int32)
    s = _decode_huff(br, dc_tbl)
    pred[ci] += _extend(br.receive(s), s)
    coeffs[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_huff(br, ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:                                  # ZRL: 16 zeros
                k += 16
                continue
            break                                        # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        coeffs[k] = _extend(br.receive(s), s)
        k += 1
    block = np.zeros(64, np.float64)
    block[ZIGZAG] = coeffs * q                           # dequant+dezigzag
    return _A.T @ block.reshape(8, 8) @ _A + 128.0       # IDCT+level shift


# --------------------------------------------------------------- progressive

def _comp_blocks(c: dict, comps: list[dict], w: int, h: int) -> tuple[int, int]:
    """Non-interleaved block-grid dimensions of one component: blocks over
    ceil(comp_size/8) where comp_size is the subsampled image size."""
    hmax = max(x["hs"] for x in comps)
    vmax = max(x["vs"] for x in comps)
    cw = -(-w * c["hs"] // hmax)
    ch = -(-h * c["vs"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_prog_scan(data, pos, w, h, comps, scan_comps, ss, se, ah, al,
                      huff_dc, huff_ac, restart_interval, coeffs) -> int:
    """Decode ONE progressive scan into the per-component coefficient
    accumulators (T.81 §G.2); returns the stream position of the next
    marker. Four scan kinds: DC first / DC refinement (interleaved or
    not), AC first / AC refinement (always single-component)."""
    br = _BitReader(data, pos)
    state = {"eobrun": 0}
    pred = [0] * len(comps)
    is_dc = ss == 0
    if not is_dc and len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")

    def restart(count: int) -> bool:
        if not restart_interval or count == 0 or count % restart_interval:
            return False
        m = br.align_to_marker()
        if not 0xD0 <= m <= 0xD7:
            raise ValueError(f"expected RSTn, got 0x{m:02x}")
        pred[:] = [0] * len(comps)
        state["eobrun"] = 0
        return True

    if len(scan_comps) > 1:                       # interleaved (DC only)
        hmax = max(c["hs"] for c in comps)
        vmax = max(c["vs"] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                restart(count)
                for ci, td, _ta in scan_comps:
                    c = comps[ci]
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            blk = coeffs[ci][my * c["vs"] + by,
                                             mx * c["hs"] + bx]
                            if ah == 0:
                                _dc_first(br, huff_dc[td], pred, ci, blk, al)
                            else:
                                _dc_refine(br, blk, al)
                count += 1
    else:
        ci, td, ta = scan_comps[0]
        bh, bw = _comp_blocks(comps[ci], comps, w, h)
        count = 0
        for by in range(bh):
            for bx in range(bw):
                restart(count)
                blk = coeffs[ci][by, bx]
                if is_dc:
                    if ah == 0:
                        _dc_first(br, huff_dc[td], pred, ci, blk, al)
                    else:
                        _dc_refine(br, blk, al)
                elif ah == 0:
                    _ac_first(br, huff_ac[ta], blk, ss, se, al, state)
                else:
                    _ac_refine(br, huff_ac[ta], blk, ss, se, al, state)
                count += 1
    # seek the next marker (the main loop resumes parsing there)
    p = br.pos
    while p < len(data) - 1 and (data[p] != 0xFF or data[p + 1] == 0x00):
        p += 1
    return p


def _dc_first(br, tbl, pred, ci, blk, al):
    s = _decode_huff(br, tbl)
    pred[ci] += _extend(br.receive(s), s)
    blk[0] = pred[ci] << al


def _dc_refine(br, blk, al):
    if br.bit():
        blk[0] |= 1 << al


def _ac_first(br, tbl, blk, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(br, tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:                       # EOB run of 2^r + bits blocks
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.receive(r)
                return
            k += 16                           # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past spectral band")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1


def _ac_refine(br, tbl, blk, ss, se, al, state):
    """Successive-approximation AC refinement (T.81 §G.2.2): each already
    nonzero coefficient in the band receives a correction bit; runs count
    only zero-history coefficients; newly significant coefficients carry
    ±1<<al. EOB runs refine the remainder of each covered block."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_huff(br, tbl)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.receive(r)
                    break                      # EOB: fall through to tail
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                val = p1 if br.bit() else m1
            while k <= se:
                if blk[k]:
                    if br.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if blk[k]:
                if br.bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _reconstruct_progressive(w, h, comps, qt, coeffs):
    """All scans consumed: dequant + de-zigzag + IDCT every block of every
    component (vectorized over the block grid), then the same upsample +
    color-convert tail as the baseline path."""
    planes = []
    for c, cf in zip(comps, coeffs):
        bh, bw, _ = cf.shape
        blocks = np.zeros((bh, bw, 64), np.float64)
        blocks[:, :, ZIGZAG] = cf * qt[c["tq"]][None, None, :]
        spatial = np.einsum("ux,ijuv,vy->ijxy", _A,
                            blocks.reshape(bh, bw, 8, 8), _A) + 128.0
        planes.append(spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    out = []
    for c, plane in zip(comps, planes):
        up = _upsample(plane, vmax // c["vs"], hmax // c["hs"])
        out.append(up[:h, :w])
    if len(out) == 1:
        px = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[:, :, None]
        return w, h, 1, px
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
