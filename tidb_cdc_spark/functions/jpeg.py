"""Baseline JPEG (JFIF, SOF0) decode in pure Python + numpy — no
codec library. The last compressed image format a crawl sees in
volume becomes a REAL pixel path: table-driven Huffman (the tables
come from the file's DHT segments, so Annex-K and custom-table
JPEGs both decode), zigzag + dequantization, an orthogonal float64
IDCT, 0xFF00 byte-unstuffing, DRI/RSTn restart handling, and
general interleaved MCUs — ANY sampling-factor combination with
integer upsample ratios (4:4:4, 4:2:0, 4:2:2, 4:4:0, ...), chroma
upsampled by deterministic pixel replication (libjpeg's "fancy"
bilinear variant is a smoothing choice, not bitstream semantics).
Progressive SOF2 and arithmetic coding return None for the guarded
PIL branch.

Exactness model (what the audits pin): JPEG is lossy in general,
but a FLAT 8×8 block is DC-only — with quantization step 1 the DC
coefficient (8·(v-128)) is stored exactly and the IDCT of a DC-only
block is exactly flat v again, so block-aligned plants round-trip
BIT-EXACTLY and the planted-arithmetic hash oracles carry over
unchanged (`multimodal_jpeg_phash_audit`). For general images the
reconstruction error is bounded by coefficient rounding (orthogonal
transform ⇒ ‖Δpixels‖₂ = ‖Δcoeffs‖₂ ≤ 4 at quant 1), pinned by a
round-trip tolerance test. Platform note: the IDCT basis is float64
cosines; integer rounding absorbs ~1e-13 BLAS residue exactly as
``dct_phash64`` does, and the flat-block path the oracles rely on
has integer-exact coefficients (margin test in
tests/test_jpeg_codec.py).

Scale shape: identical to the other pixel paths — decode rides the
Arrow-batched ``mapInPandas`` pass via ``decode_pixels``; CPU is
∝ pixel bytes, hashes (24 B) shuffle, pixels never do.

The encoder half (``encode_jpeg``) is a TEST FIXTURE like the
PNG/GIF encoders: it writes real interchange-format JPEGs (APP0 +
DQT + SOF0 + DHT + SOS, optional DRI/RSTn) using self-generated
canonical Huffman tables (all DC symbols at one code length, all AC
symbols at another — valid JPEG, carried in DHT, and deliberately
NOT Annex K so the decoder's table-driven path is what's tested).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan → (row, col) in the 8×8
# block, per ITU-T T.81 Figure 5
_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_basis():
    """The orthogonal 8-point DCT-II matrix M (M[u, x] =
    C(u)/2 · cos((2x+1)uπ/16)); pixels = Mᵀ F M for coefficient
    block F. M is orthogonal, so the transform preserves L2 norm —
    the error-bound lemma in the module docstring."""
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_IDCT_M = _idct_basis()


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing.
    Stops at any non-stuffing marker (the caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        while self.nbits < 25:
            if self.pos >= len(self.d):
                return self.nbits > 0
            b = self.d[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.d):
                    return self.nbits > 0
                nxt = self.d[self.pos + 1]
                if nxt == 0x00:  # stuffed 0xFF data byte
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                return self.nbits > 0  # a real marker: stop here
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        return True

    def read_bit(self) -> "int | None":
        if self.nbits == 0 and not self._fill():
            return None
        if self.nbits == 0:
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> "int | None":
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align_and_expect_rst(self) -> bool:
        """Byte-align and consume an RSTn marker (restart interval
        boundary)."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 1 >= len(self.d) or self.d[self.pos] != 0xFF:
            return False
        if not 0xD0 <= self.d[self.pos + 1] <= 0xD7:
            return False
        self.pos += 2
        return True


def _build_huff(counts: "list[int]", symbols: bytes):
    """Canonical JPEG Huffman table → dict {(length, code): symbol}
    per T.81 Annex C code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(symbols):
                return None
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table) -> "int | None":
    code = 0
    for length in range(1, 17):
        b = br.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, t: int) -> int:
    """JPEG sign-extension (T.81 F.2.2.1): a t-bit magnitude with
    MSB 0 encodes a negative value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(payload: bytes):
    """REAL baseline-JPEG pixel decode → int64 BT.601 luma array
    (h, w), or None for anything outside the supported envelope
    (progressive, 12-bit, arithmetic-coded, non-integer upsample
    ratios, truncated, or malformed streams — the
    guarded-PIL/NULL-hash treatment).

    Grayscale scans return Y directly (luma(g,g,g) = g); 3-component
    scans (any sampling layout incl. 4:2:0, chroma upsampled by
    replication) convert YCbCr→RGB with the JFIF integer convention
    (round-half-away via floor(x+0.5), clip 0..255) and reduce with
    the same BT.601 integer luma every other pixel path uses."""
    p = payload
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    dri = 0
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            return None
        marker = p[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            return None  # EOI before SOS
        (seglen,) = struct.unpack_from(">H", p, pos + 2)
        seg = p[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                n = 64 * (2 if pq == 1 else 1)
                if i + n > len(seg):
                    return None
                if pq == 1:
                    vals = np.frombuffer(
                        seg[i : i + n], dtype=">u2"
                    ).astype(np.int64)
                else:
                    vals = np.frombuffer(
                        seg[i : i + n], dtype=np.uint8
                    ).astype(np.int64)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZZ] = vals  # de-zigzag into natural order
                qt[tq] = tbl.reshape(8, 8)
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                syms = seg[i + 17 : i + 17 + n]
                if len(syms) != n:
                    return None
                t = _build_huff(counts, syms)
                if t is None:
                    return None
                huff[(tc, th)] = t
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8 or ncomp not in (1, 3) or w == 0 or h == 0:
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hi, vi = hv >> 4, hv & 0xF
                if ncomp == 1:
                    # single-component scans are non-interleaved:
                    # sampling factors are ignored (T.81 A.2)
                    hi = vi = 1
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    return None
                comps.append((cid, tq, hi, vi))
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            if any(hmax % c[2] or vmax % c[3] for c in comps):
                return None  # non-integer upsample ratio
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline SOF / arithmetic coding
        elif marker == 0xDD:  # DRI
            if seglen != 4:
                return None
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                return None
            ns = seg[0]
            h, w, comps = sof
            if ns != len(comps):
                return None
            sel = []
            for c in range(ns):
                _cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                dc_t = huff.get((0, tda >> 4))
                ac_t = huff.get((1, tda & 0xF))
                q = qt.get(comps[c][1])
                if dc_t is None or ac_t is None or q is None:
                    return None
                sel.append((dc_t, ac_t, q, comps[c][2], comps[c][3]))
            return _decode_scan(p, pos + 2 + seglen, h, w, sel, dri)
        # APPn / COM / others: skip
        pos += 2 + seglen
    return None


def _decode_block(br, dc_t, ac_t, q, pred_box, ci):
    """One entropy-coded 8×8 block → dequantized spatial pixels (or
    None on a malformed stream). ``pred_box`` carries the per-
    component DC predictors across MCUs."""
    coef = np.zeros(64, dtype=np.int64)
    t = _huff_decode(br, dc_t)
    if t is None or t > 11:
        return None
    bits = br.read_bits(t) if t else 0
    if bits is None:
        return None
    pred_box[ci] += _extend(bits, t)
    coef[0] = pred_box[ci]
    k = 1
    while k < 64:
        sym = _huff_decode(br, ac_t)
        if sym is None:
            return None
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k > 63 or size == 0:
            return None
        bits = br.read_bits(size)
        if bits is None:
            return None
        coef[_ZZ[k]] = _extend(bits, size)
        k += 1
    blk = coef.reshape(8, 8) * q
    return _IDCT_M.T @ blk.astype(np.float64) @ _IDCT_M


def _decode_scan(p, pos, h, w, sel, dri):
    """General interleaved-MCU scan: each MCU carries h_i×v_i blocks
    per component; subsampled planes are upsampled by PIXEL
    REPLICATION (each chroma sample covers its Hmax/h_i × Vmax/v_i
    pixel footprint — deterministic; libjpeg's "fancy" bilinear
    variant is a smoothing choice, not part of the bitstream)."""
    ncomp = len(sel)
    hmax = max(s[3] for s in sel)
    vmax = max(s[4] for s in sel)
    mw = (w + 8 * hmax - 1) // (8 * hmax)
    mh = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mh * vi * 8, mw * hi * 8), dtype=np.float64)
        for (_, _, _, hi, vi) in sel
    ]
    br = _BitReader(p, pos)
    pred = [0] * ncomp
    mcu = 0
    for my in range(mh):
        for mx in range(mw):
            if dri and mcu and mcu % dri == 0:
                if not br.align_and_expect_rst():
                    return None
                pred = [0] * ncomp
            for ci, (dc_t, ac_t, q, hi, vi) in enumerate(sel):
                for by in range(vi):
                    for bx in range(hi):
                        px = _decode_block(br, dc_t, ac_t, q, pred, ci)
                        if px is None:
                            return None
                        r0 = (my * vi + by) * 8
                        c0 = (mx * hi + bx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = px
            mcu += 1
    up = []
    for pl, (_, _, _, hi, vi) in zip(planes, sel):
        if hi != hmax or vi != vmax:
            pl = np.repeat(
                np.repeat(pl, vmax // vi, axis=0), hmax // hi, axis=1
            )
        up.append(pl[:h, :w])
    if ncomp == 1:
        return np.clip(np.floor(up[0] + 128.5), 0, 255).astype(np.int64)
    y = up[0] + 128.0
    cb = up[1]
    cr = up[2]
    # JFIF YCbCr→RGB, round-half-up then clip (Cb/Cr already
    # level-shifted around 0 here since +128 was not applied)
    r = np.clip(np.floor(y + 1.402 * cr + 0.5), 0, 255).astype(np.int64)
    g = np.clip(
        np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5), 0, 255
    ).astype(np.int64)
    b = np.clip(np.floor(y + 1.772 * cb + 0.5), 0, 255).astype(np.int64)
    return (r * 299 + g * 587 + b * 114) // 1000


# ------------------------------------------------ encoder (fixture)


def _huff_spec_dc():
    """All 12 DC size symbols at code length 4 (12 ≤ 2⁴−1 — valid:
    the all-ones code stays unused per T.81 C.2)."""
    counts = [0] * 16
    counts[3] = 12
    return counts, bytes(range(12))


def _huff_spec_ac():
    """All 162 baseline AC symbols (EOB, ZRL, run 0-15 × size 1-10)
    at code length 8 (162 ≤ 2⁸−1)."""
    syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    syms.sort()
    counts = [0] * 16
    counts[7] = len(syms)
    return counts, bytes(syms)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-bits padding per spec


def _enc_table(counts, symbols):
    """symbol → (code, length) for the canonical assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _size_cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _fwd_block(blk) -> np.ndarray:
    """Forward DCT of one level-shifted spatial block → clamped
    integer coefficients in NATURAL order (quant step 1)."""
    f = _IDCT_M @ np.asarray(blk, dtype=np.float64) @ _IDCT_M.T
    coef = np.rint(f).astype(np.int64).ravel()
    # baseline 8-bit AC categories stop at 10 (|v| ≤ 1023); the
    # exact-basis-matching adversarial block can round to ±1024 —
    # clamp (1-LSB distortion on a synthetic extreme, spec-valid
    # stream always)
    coef[1:] = np.clip(coef[1:], -1023, 1023)
    return coef.reshape(8, 8)


def _write_block(bwr, coef, pred, ci, dc_enc, ac_enc):
    cvec = coef.ravel()[_ZZ]
    diff = int(cvec[0]) - pred[ci]
    pred[ci] = int(cvec[0])
    t = _size_cat(diff)
    code, ln = dc_enc[t]
    bwr.write(code, ln)
    if t:
        bwr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(cvec[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            bwr.write(code, ln)
            run -= 16
        s = _size_cat(v)
        code, ln = ac_enc[(run << 4) | s]
        bwr.write(code, ln)
        bwr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_enc[0x00]
        bwr.write(code, ln)


def _pad_replicate(g, ph: int, pw: int) -> np.ndarray:
    h, w = g.shape
    padded = np.zeros((ph, pw), dtype=np.int64)
    padded[:h, :w] = g
    if h < ph:
        padded[h:, :w] = g[-1:, :]
    if w < pw:
        padded[:, w:] = padded[:, w - 1 : w]
    return padded


def encode_jpeg(
    gray,
    color: bool = False,
    restart_interval: int = 0,
    subsampling: str = "444",
    cb_const: int = 0,
    cr_const: int = 0,
) -> bytes:
    """TEST FIXTURE: encode an int64 gray array as a REAL baseline
    JFIF JPEG with quantization step 1 everywhere (so flat 8×8
    blocks round-trip exactly) and the self-generated fixed-length
    Huffman tables above. ``color=True`` writes a 3-component scan —
    ``subsampling="444"`` (all factors 1) or ``"420"`` (Y at 2×2,
    chroma quarter-res: the layout most real crawls carry) — whose
    chroma planes are FLAT at ``cb_const``/``cr_const`` (signed,
    around the 128 level shift). Flat chroma quantizes exactly, so
    the decoded RGB is an exact integer function of (gray, cb, cr)
    under the JFIF conversion — including through the replication
    upsample. ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (exercises the decoder's restart path)."""
    g = np.asarray(gray, dtype=np.int64)
    h, w = g.shape
    if not color:
        comps = [(0x11, None)]
    elif subsampling == "444":
        comps = [(0x11, None), (0x11, cb_const), (0x11, cr_const)]
    elif subsampling == "420":
        comps = [(0x22, None), (0x11, cb_const), (0x11, cr_const)]
    else:
        raise ValueError(f"unsupported subsampling: {subsampling!r}")
    hmax = max(c[0] >> 4 for c in comps)
    vmax = max(c[0] & 0xF for c in comps)
    mw = (w + 8 * hmax - 1) // (8 * hmax)
    mh = (h + 8 * vmax - 1) // (8 * vmax)
    padded = _pad_replicate(g, mh * vmax * 8, mw * hmax * 8)
    dc_counts, dc_syms = _huff_spec_dc()
    ac_counts, ac_syms = _huff_spec_ac()
    dc_enc = _enc_table(dc_counts, dc_syms)
    ac_enc = _enc_table(ac_counts, ac_syms)
    ncomp = len(comps)

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    # DQT: table 0, all ones (zigzag order is all-ones too)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + b"\x01" * 64
    # SOF0
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c, (hv, _) in enumerate(comps):
        sof += bytes([c + 1, hv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC class 0 id 0, AC class 1 id 0
    dht = bytes([0x00]) + bytes(dc_counts) + dc_syms
    dht += bytes([0x10]) + bytes(ac_counts) + ac_syms
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # flat chroma block coefficients: DC = 8·const, AC = 0 (exact)
    flat_coef = {
        cst: _fwd_block(np.full((8, 8), cst, dtype=np.int64))
        for _, cst in comps
        if cst is not None
    }
    bwr = _BitWriter()
    pred = [0] * ncomp
    mcu = 0
    rst = 0
    for my in range(mh):
        for mx in range(mw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bwr.flush()
                out += bwr.out
                bwr = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = [0] * ncomp
            for ci, (hv, cst) in enumerate(comps):
                hi, vi = hv >> 4, hv & 0xF
                for by in range(vi):
                    for bx in range(hi):
                        if cst is not None:
                            coef = flat_coef[cst]
                        else:
                            r0 = (my * vi + by) * 8
                            c0 = (mx * hi + bx) * 8
                            blk = padded[r0 : r0 + 8, c0 : c0 + 8]
                            coef = _fwd_block(blk - 128)
                        _write_block(bwr, coef, pred, ci, dc_enc, ac_enc)
            mcu += 1
    bwr.flush()
    out += bwr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
