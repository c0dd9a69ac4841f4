"""Progressive JPEG (SOF2) decode: spectral selection, successive
approximation, interleaved DC scans, EOB-run coding, AC refinement.

Ground truth without any image library: the test builds progressive
streams with its OWN minimal encoder (canonical length-8 Huffman tables,
byte stuffing, the T.81 §G encoder algorithms mirrored from the public
spec), starting from KNOWN quantized coefficient arrays — so the decoder
must recover those exact coefficients, which we verify byte-exactly by
comparing pixels against ``_reconstruct_progressive`` called directly on
the known arrays. This isolates the new scan/entropy machinery; the
IDCT/upsample/color tail is shared with (and already golden-tested by)
the baseline path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from walmart_project_etl_spark.operators import jpeg


# --------------------------------------------------------- mini encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def bit(self, b: int) -> None:
        self.acc = (self.acc << 1) | (b & 1)
        self.n += 1
        if self.n == 8:
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)           # byte stuffing
            self.acc, self.n = 0, 0

    def bits(self, v: int, n: int) -> None:
        for i in reversed(range(n)):
            self.bit((v >> i) & 1)

    def flush(self) -> bytes:
        while self.n:
            self.bit(1)                         # pad with 1s
        return bytes(self.out)


# canonical tables: every symbol at code length 8, code = index
_DC_SYMS = list(range(12))
_AC_SYMS = [(r << 4) | s for r in range(16) for s in range(11)]


def _dht(cls: int, th: int, syms: list[int]) -> bytes:
    body = bytes([cls << 4 | th]) + bytes([0] * 7 + [len(syms)] + [0] * 8) \
        + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _emit_sym(bw: _BitWriter, syms: list[int], sym: int) -> None:
    bw.bits(syms.index(sym), 8)


def _mag_bits(bw: _BitWriter, v: int) -> None:
    s = abs(v).bit_length()
    bw.bits(v if v > 0 else v + (1 << s) - 1, s)


def _flush_eobrun(bw: _BitWriter, eobrun: int) -> int:
    while eobrun:
        r = min(eobrun.bit_length() - 1, 14)
        chunk = min(eobrun, (1 << (r + 1)) - 1)
        r = chunk.bit_length() - 1
        _emit_sym(bw, _AC_SYMS, r << 4)
        if r:
            bw.bits(chunk - (1 << r), r)
        eobrun -= chunk
    return 0


def _encode_dc_scan(bw, units, coeffs, al, ah) -> None:
    """units: ordered (ci, by, bx); first scan (ah=0) or refinement."""
    pred: dict[int, int] = {}
    for ci, by, bx in units:
        c0 = int(coeffs[ci][by, bx, 0])
        if ah == 0:
            v = c0 >> al
            diff = v - pred.get(ci, 0)
            pred[ci] = v
            s = abs(diff).bit_length()
            _emit_sym(bw, _DC_SYMS, s)
            _mag_bits(bw, diff)
        else:
            bw.bit((c0 >> al) & 1)


def _encode_ac_first(bw, blocks, ss, se, al) -> None:
    eobrun = 0
    for blk in blocks:
        vals = [int(np.sign(blk[k])) * (abs(int(blk[k])) >> al)
                for k in range(ss, se + 1)]
        last = max((i for i, v in enumerate(vals) if v), default=-1)
        if last < 0:
            eobrun += 1
            continue
        eobrun = _flush_eobrun(bw, eobrun)
        r = 0
        for v in vals[:last + 1]:
            if v == 0:
                r += 1
                continue
            while r > 15:
                _emit_sym(bw, _AC_SYMS, 0xF0)   # ZRL
                r -= 16
            s = abs(v).bit_length()
            _emit_sym(bw, _AC_SYMS, (r << 4) | s)
            _mag_bits(bw, v)
            r = 0
        if last < se - ss:
            eobrun += 1
    _flush_eobrun(bw, eobrun)


def _encode_ac_refine(bw, blocks, ss, se, al) -> None:
    """Per-block flush (EOBRUN of at most 1): runs count only
    zero-history coefficients; correction bits for already-nonzero ones
    ride buffered behind the symbol that ends the run (T.81 §G.1.2.3)."""
    for blk in blocks:
        temps = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        signs = [1 if blk[k] >= 0 else -1 for k in range(ss, se + 1)]
        newly = [i for i, t in enumerate(temps) if t == 1]
        eob = newly[-1] if newly else -1          # last newly-significant
        r, corrections = 0, []
        for i, (t, sg) in enumerate(zip(temps, signs)):
            if t == 0:
                r += 1
                continue
            # ZRLs must flush as soon as 16 zero-history zeros have
            # accumulated (at ANY nonzero), carrying only the correction
            # bits buffered so far — the decoder consumes corrections
            # positionally within each ZRL span. Trailing ZRLs past the
            # last newly-significant coefficient fold into the EOB.
            while r > 15 and i <= eob:
                _emit_sym(bw, _AC_SYMS, 0xF0)
                for b in corrections:
                    bw.bit(b)
                corrections = []
                r -= 16
            if t > 1:                             # old nonzero: correction
                corrections.append(t & 1)
                continue
            _emit_sym(bw, _AC_SYMS, (r << 4) | 1)  # newly significant
            bw.bit(1 if sg > 0 else 0)
            for b in corrections:
                bw.bit(b)
            corrections = []
            r = 0
        if r > 0 or corrections:
            _emit_sym(bw, _AC_SYMS, 0x00)         # EOB (run = 1)
            for b in corrections:
                bw.bit(b)


def encode_progressive(w, h, comps_spec, coeffs, qtbl, scans) -> bytes:
    """Assemble a progressive JPEG from known zigzag-quantized
    coefficient grids. ``scans``: (comp_indices, ss, se, ah, al)."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qtbl)
    sof = struct.pack(">BHHB", 8, h, w, len(comps_spec))
    for c in comps_spec:
        sof += bytes([c["id"], (c["hs"] << 4) | c["vs"], c["tq"]])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, _DC_SYMS) + _dht(1, 0, _AC_SYMS)
    hmax = max(c["hs"] for c in comps_spec)
    vmax = max(c["vs"] for c in comps_spec)
    for comp_idx, ss, se, ah, al in scans:
        hdr = bytes([len(comp_idx)])
        for ci in comp_idx:
            hdr += bytes([comps_spec[ci]["id"], 0x00])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(hdr) + 2) + hdr
        bw = _BitWriter()
        if ss == 0:
            if len(comp_idx) > 1:                 # interleaved DC
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                units = [(ci, my * comps_spec[ci]["vs"] + by,
                          mx * comps_spec[ci]["hs"] + bx)
                         for my in range(mcuy) for mx in range(mcux)
                         for ci in comp_idx
                         for by in range(comps_spec[ci]["vs"])
                         for bx in range(comps_spec[ci]["hs"])]
            else:
                ci = comp_idx[0]
                bh, bw_ = jpeg._comp_blocks(comps_spec[ci], comps_spec, w, h)
                units = [(ci, by, bx) for by in range(bh)
                         for bx in range(bw_)]
            _encode_dc_scan(bw, units, coeffs, al, ah)
        else:
            ci = comp_idx[0]
            bh, bw_ = jpeg._comp_blocks(comps_spec[ci], comps_spec, w, h)
            blocks = [coeffs[ci][by, bx] for by in range(bh)
                      for bx in range(bw_)]
            if ah == 0:
                _encode_ac_first(bw, blocks, ss, se, al)
            else:
                _encode_ac_refine(bw, blocks, ss, se, al)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _quantize(px_plane: np.ndarray, qtbl) -> np.ndarray:
    """Known-truth coefficients: forward DCT + quantize, zigzag order."""
    h, w = px_plane.shape
    bh, bw = h // 8, w // 8
    out = np.zeros((bh, bw, 64), np.int32)
    q = np.asarray(qtbl, np.float64)[jpeg.ZIGZAG.argsort()]  # natural order
    qnat = np.zeros(64)
    qnat[jpeg.ZIGZAG] = np.asarray(qtbl, np.float64)
    for by in range(bh):
        for bx in range(bw):
            blk = px_plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] \
                .astype(np.float64) - 128.0
            C = jpeg._A @ blk @ jpeg._A.T
            out[by, bx] = np.round(C.reshape(64)[jpeg.ZIGZAG]
                                   / qnat[jpeg.ZIGZAG]).astype(np.int32)
    return out


_Q16 = [16] * 64


def _expected(w, h, comps_spec, qt_map, coeffs):
    return jpeg._reconstruct_progressive(
        w, h, comps_spec, {k: np.asarray(v, np.int32)
                           for k, v in qt_map.items()}, coeffs)


def test_progressive_gray_full_scan_script_roundtrip():
    """Gray 16×16, the classic 6-scan script: DC first(Al=1) → AC bands
    first(Al=1) → DC refine → AC band refines. Decoder must land on
    byte-identical pixels to direct reconstruction of the known
    coefficients (i.e. every coefficient recovered exactly)."""
    rng = np.random.default_rng(7)
    base = rng.integers(40, 216, (4, 4)).astype(np.float64)
    px = np.kron(base, np.ones((4, 4))) + rng.normal(0, 12, (16, 16))
    px = np.clip(px, 0, 255).astype(np.uint8)
    comps = [{"id": 1, "hs": 1, "vs": 1, "tq": 0}]
    coeffs = [_quantize(px.astype(np.float64), _Q16)]
    scans = [([0], 0, 0, 0, 1),
             ([0], 1, 5, 0, 1),
             ([0], 6, 63, 0, 1),
             ([0], 0, 0, 1, 0),
             ([0], 1, 5, 1, 0),
             ([0], 6, 63, 1, 0)]
    data = encode_progressive(16, 16, comps, coeffs, _Q16, scans)
    w, h, c, got = jpeg.decode_jpeg(data)
    assert (w, h, c) == (16, 16, 1)
    _, _, _, want = _expected(16, 16, comps, {0: _Q16}, coeffs)
    assert np.array_equal(got, want)


def test_progressive_gray_eobrun_across_blocks():
    """EOB RUNS spanning blocks: known coefficient grids where the high
    band is empty in long block runs (eobrun > 1, including one broken
    mid-scan by a lone high-band coefficient) — the cross-block path a
    per-block encoder never exercises."""
    coeffs = [np.zeros((2, 4, 64), np.int32)]
    for i, (by, bx) in enumerate([(y, x) for y in range(2)
                                  for x in range(4)]):
        coeffs[0][by, bx, 0] = 3 * i - 8            # varied DC
        coeffs[0][by, bx, 1 + i % 5] = i - 4        # low band only...
    coeffs[0][1, 1, 40] = -3                        # ...except one block
    comps = [{"id": 1, "hs": 1, "vs": 1, "tq": 0}]
    scans = [([0], 0, 0, 0, 0),
             ([0], 1, 5, 0, 0),
             ([0], 6, 63, 0, 0)]                    # eobrun 5 then 2
    data = encode_progressive(32, 16, comps, coeffs, _Q16, scans)
    w, h, c, got = jpeg.decode_jpeg(data)
    _, _, _, want = _expected(32, 16, comps, {0: _Q16}, coeffs)
    assert (w, h, c) == (32, 16, 1)
    assert np.array_equal(got, want)


def test_progressive_color_interleaved_dc_and_subsampling():
    """3-component 4:2:0: the DC scan is INTERLEAVED (MCU traversal over
    2×2 luma + 1+1 chroma blocks), AC scans are per-component over each
    component's own block grid — the two traversal orders progressive
    decode must keep straight."""
    rng = np.random.default_rng(11)
    planes = [np.clip(rng.normal(128, 40, (16, 16)), 0, 255),   # Y 16×16
              np.clip(rng.normal(128, 20, (8, 8)), 0, 255),     # Cb 8×8
              np.clip(rng.normal(128, 20, (8, 8)), 0, 255)]     # Cr 8×8
    comps = [{"id": 1, "hs": 2, "vs": 2, "tq": 0},
             {"id": 2, "hs": 1, "vs": 1, "tq": 0},
             {"id": 3, "hs": 1, "vs": 1, "tq": 0}]
    coeffs = [_quantize(p, _Q16) for p in planes]
    scans = [([0, 1, 2], 0, 0, 0, 1),
             ([0], 1, 63, 0, 0),
             ([1], 1, 63, 0, 0),
             ([2], 1, 63, 0, 0),
             ([0, 1, 2], 0, 0, 1, 0)]
    data = encode_progressive(16, 16, comps, coeffs, _Q16, scans)
    w, h, c, got = jpeg.decode_jpeg(data)
    assert (w, h, c) == (16, 16, 3)
    _, _, _, want = _expected(16, 16, comps, {0: _Q16}, coeffs)
    assert np.array_equal(got, want)


def test_progressive_refinement_actually_refines():
    """Truncating the scan script after the first-approximation scans
    must change the output (coarser pixels) — i.e. the refinement scans
    carry real information and the decoder applies them."""
    rng = np.random.default_rng(3)
    px = np.clip(rng.normal(128, 50, (16, 16)), 0, 255).astype(np.uint8)
    comps = [{"id": 1, "hs": 1, "vs": 1, "tq": 0}]
    coeffs = [_quantize(px.astype(np.float64), _Q16)]
    full = [([0], 0, 0, 0, 1), ([0], 1, 63, 0, 1),
            ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]
    head = full[:2]
    d_full = encode_progressive(16, 16, comps, coeffs, _Q16, full)
    d_head = encode_progressive(16, 16, comps, coeffs, _Q16, head)
    _, _, _, px_full = jpeg.decode_jpeg(d_full)
    _, _, _, px_head = jpeg.decode_jpeg(d_head)
    _, _, _, want = _expected(16, 16, comps, {0: _Q16}, coeffs)
    assert np.array_equal(px_full, want)
    assert not np.array_equal(px_head, px_full)
    # and the coarse pass is still a plausible approximation, not garbage
    assert np.abs(px_head.astype(int) - px_full.astype(int)).mean() < 16


def test_progressive_dispatches_through_decode_payload():
    """operators/multimodal.decode_payload must route SOF2 files to the
    progressive path (it dispatches on the SOI marker, which is shared)."""
    from walmart_project_etl_spark.operators import multimodal as mm
    px = np.full((8, 8), 200, np.uint8)
    comps = [{"id": 1, "hs": 1, "vs": 1, "tq": 0}]
    coeffs = [_quantize(px.astype(np.float64), _Q16)]
    scans = [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)]
    data = encode_progressive(8, 8, comps, coeffs, _Q16, scans)
    w, h, c, got = mm.decode_payload(data)
    assert (w, h, c) == (8, 8, 1)
    assert np.unique(got).tolist() == [200]


def test_progressive_arithmetic_still_raises():
    """SOF10 (progressive arithmetic) stays an explicit refusal."""
    seg = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    data = (b"\xff\xd8" + b"\xff\xca"
            + struct.pack(">H", len(seg) + 2) + seg + b"\xff\xd9")
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(data)


@pytest.mark.parametrize("seed", list(range(8)))
def test_progressive_random_scan_scripts_roundtrip(seed):
    """Property: for random coefficient grids and RANDOM spectral-band
    partitions of 1..63 (with successive approximation on every band),
    decode must recover the exact coefficients. Catches band-boundary,
    EOB-run, and ZRL-in-refinement edge cases a fixed script misses."""
    rng = np.random.default_rng(100 + seed)
    bh, bw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
    coeffs = [np.zeros((bh, bw, 64), np.int32)]
    for by in range(bh):
        for bx in range(bw):
            coeffs[0][by, bx, 0] = int(rng.integers(-30, 30))
            # sparse AC values, including magnitude-1 entries that only
            # become significant in the refinement scan and deep
            # positions forcing long zero runs (ZRL paths)
            for k in rng.choice(np.arange(1, 64),
                                size=int(rng.integers(0, 8)),
                                replace=False):
                coeffs[0][by, bx, k] = int(rng.integers(-7, 8)) or 1
    # random partition of 1..63 into consecutive bands
    cuts = sorted(rng.choice(np.arange(2, 63),
                             size=int(rng.integers(1, 4)),
                             replace=False).tolist())
    bounds = [1] + cuts + [64]
    bands = [(bounds[i], bounds[i + 1] - 1) for i in range(len(bounds) - 1)]
    comps = [{"id": 1, "hs": 1, "vs": 1, "tq": 0}]
    scans = [([0], 0, 0, 0, 1)]
    scans += [([0], ss, se, 0, 1) for ss, se in bands]
    scans += [([0], 0, 0, 1, 0)]
    scans += [([0], ss, se, 1, 0) for ss, se in bands]
    data = encode_progressive(bw * 8, bh * 8, comps, coeffs, _Q16, scans)
    w, h, c, got = jpeg.decode_jpeg(data)
    _, _, _, want = _expected(bw * 8, bh * 8, comps, {0: _Q16}, coeffs)
    assert (w, h, c) == (bw * 8, bh * 8, 1), (seed, bands)
    assert np.array_equal(got, want), (seed, bands)


# ------------------------------------------------ real-encoder golden

def test_real_progressive_jpeg_golden():
    """A REAL progressive JPEG from an independent encoder (Node.js docs
    banner, JFIF/SOF2 with spectral selection + successive approximation
    — shipped in this container's nodejs package, checked in at 6.5 KB):
    closes the self-mirroring gap where encoder and decoder could share
    a misreading of T.81 §G. External pixel truth without an image
    library comes from the image's known structure — a uniform Node.js-
    green stripe (G far above R/B: a component/scan mix-up would destroy
    the channel split) over a near-white body; a single Huffman desync
    or bad refinement pass turns rows into noise and blows these bounds.
    The md5 is OUR decoder's regression digest (not external truth):
    any behavior change must be reviewed and re-pinned."""
    import hashlib
    import os

    p = os.path.join(os.path.dirname(__file__), "fixtures",
                     "nodejs_thin_white_stripe_progressive.jpg")
    with open(p, "rb") as fh:
        data = fh.read()
    assert data[6:10] == b"JFIF" and b"\xff\xc2" in data     # really SOF2
    w, h, c, px = jpeg.decode_jpeg(data)
    assert (w, h, c) == (493, 58, 3)
    px = np.asarray(px).astype(int)
    stripe = px[:5, :, :]
    r, g, b = stripe.mean(axis=(0, 1))
    assert g - r > 40 and g - b > 40, (r, g, b)   # green stripe
    assert 70 < stripe.mean() < 110, stripe.mean()
    row_means = px[6:, :, :].mean(axis=(1, 2))
    assert (row_means > 220).all(), row_means.min()  # near-white body
    assert px.max() == 255 and px.min() > 30, (px.min(), px.max())
    digest = hashlib.md5(px.astype(np.uint8).tobytes()).hexdigest()
    assert digest == "d7aa174819b83b65669174931574910b", digest
