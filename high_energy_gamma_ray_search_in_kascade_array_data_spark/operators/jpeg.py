"""Baseline JPEG (ITU-T T.81, sequential DCT, grayscale) codec in pure
stdlib + numpy — the round-6 widening of the real-codec seam
(``operators/multimodal.py``): after BMP (struct) and PNG
(struct + zlib), JPEG adds the remaining machinery a real image
pipeline exercises — marker segments, DHT canonical-Huffman table
construction, a bit-reader with 0xFF00 byte stuffing, DC prediction
across blocks, run-length/EOB/ZRL AC coding, dequantization, zigzag
ordering, and the 8×8 inverse DCT.

Scope (honest subset): baseline sequential, 8-bit, single-component
(grayscale), no restart markers, no progressive — anything else raises
``ValueError`` at the exact point a PIL/libjpeg call slots in.  The
encoder exists so the decode queries can synthesize genuine JPEG
containers deterministically (same license as ``encode_png_gray``);
files it writes are standard-conformant (canonical Huffman tables with
no all-ones code, stuffed entropy stream, Annex-B segment layout) and
readable by any JPEG decoder.

Cross-engine exactness: JPEG's IDCT is floating-point, so per-pixel
values are NOT reproducible from closed-form SQL the way the BMP/PNG
payload formula is.  The decode query therefore keys its oracle on the
fact that payloads depend only on ``event_id % 64``: the 64 distinct
images' features are computed ONCE by this same codec at registration
time and embedded in the oracle SQL as a literal lookup table — the
differential then gates the distributed path (plan-side synthesis
mapping, Arrow seam, per-row decode, feature math) against the locally
verified round-trip.  ``tests/test_properties.py`` pins the codec
itself from first principles (direct-form IDCT loop, DC-only blocks).

Reference: the reference repo has no codecs (its arrays arrive as NPZ,
``tools.py``); this is part of the engine's multimodal surface (M5).
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- tables

def _zigzag() -> list[tuple[int, int]]:
    order: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(u, s - u) for u in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag.reverse()
        order.extend(diag)
    return order


ZIGZAG = _zigzag()

# Flat (row-major) position of zigzag index i — vectorized dezigzag:
# ``flat[_ZZ_FLAT] = seq`` is the 64-iteration tuple loop as one gather.
_ZZ_FLAT = np.array([u * 8 + v for (u, v) in ZIGZAG], np.int64)

# Canonical Huffman tables. These are NOT the Annex-K defaults (no need
# to transcribe 162 magic bytes): every symbol sits at one code length,
# which yields a valid canonical table (162 codes of length 8 → max
# code 161, so the reserved all-ones code never occurs; 12 DC codes of
# length 4 → max code 11). The decoder builds its tables from the DHT
# segment, so it handles standard tables from other encoders too.
_DC_VALS = list(range(12))
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_VALS = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]


def build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from a DHT (BITS, HUFFVAL) pair."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# IDCT basis: A[u, x] = C(u)/2 · cos((2x+1)uπ/16), C(0)=1/√2.
# spatial[y, x] = Σ_u Σ_v A[u, y]·F[u, v]·A[v, x]  =  (Aᵀ F A)[y, x]
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def idct_block(coeffs: np.ndarray) -> np.ndarray:
    """Dequantized 8×8 DCT coefficients → uint8 pixels (level-shifted
    +128, floor(·+0.5) rounding, clamped)."""
    spatial = _A.T @ coeffs @ _A
    return np.clip(np.floor(spatial + 128.5), 0, 255).astype(np.uint8)


# ----------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self) -> None:
        self._bits: list[int] = []

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def to_bytes_stuffed(self) -> bytes:
        bits = self._bits + [1] * (-len(self._bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # byte stuffing
        return bytes(out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (size, appended bits)."""
    size = abs(v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def encode_jpeg_gray(coeffs: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Quantized coefficient blocks (bh, bw, 8, 8) → baseline JPEG.

    ``quant`` is the 8×8 quantization table (default all-ones: the
    encoder's coefficients ARE the dequantized values, which is what
    keeps the fixture images free of quantization surprises)."""
    coeffs = np.asarray(coeffs, dtype=np.int64)
    bh, bw, _, _ = coeffs.shape
    h, w = bh * 8, bw * 8
    q = np.ones((8, 8), np.int64) if quant is None else np.asarray(quant, np.int64)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00)  # DQT Pq=0 Tq=0
    out += bytes(int(q[u, v]) for (u, v) in ZIGZAG)
    # SOF0: precision 8, 1 component id=1, sampling 1×1, quant table 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 2 + 6 + 3, 8, h, w, 1) + bytes([1, 0x11, 0])
    for cls, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(vals), cls << 4)
        out += bytes(bits) + bytes(vals)
    # SOS: 1 component, DC table 0 / AC table 0, spectral 0..63
    out += b"\xff\xda" + struct.pack(">HB", 2 + 1 + 2 + 3, 1) + bytes([1, 0x00, 0, 63, 0])
    dc_codes, ac_codes = build_codes(_DC_BITS, _DC_VALS), build_codes(_AC_BITS, _AC_VALS)
    bw_ = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            seq = [int(coeffs[by, bx, u, v]) for (u, v) in ZIGZAG]
            diff, pred = seq[0] - pred, seq[0]
            size, extra = _magnitude(diff)
            bw_.write(*dc_codes[size])
            if size:
                bw_.write(extra, size)
            last_nz = max((i for i in range(1, 64) if seq[i]), default=0)
            run = 0
            for i in range(1, last_nz + 1):
                if seq[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    bw_.write(*ac_codes[0xF0])  # ZRL
                    run -= 16
                size, extra = _magnitude(seq[i])
                bw_.write(*ac_codes[(run << 4) | size])
                bw_.write(extra, size)
                run = 0
            if last_nz < 63:
                bw_.write(*ac_codes[0x00])  # EOB
    out += bw_.to_bytes_stuffed()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------- decoder

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 de-stuffing.

    Byte-at-a-time accumulator (not bit-at-a-time): ``_fill`` consumes
    whole stuffed bytes into an integer window, so a bit read is two
    shifts instead of a function call per bit — the r12 profile put 46%
    of the decode wall in per-bit dict walks. Error semantics are
    IDENTICAL to the per-bit reader: hitting a real marker (or the end
    of the buffer) only raises when the decode actually needs a bit
    from beyond it, so the deferred ``_stop`` error is raised at
    consumption time, never at peek time."""

    __slots__ = ("_d", "_pos", "_acc", "_nav", "_stop")

    def __init__(self, data: bytes, pos: int) -> None:
        self._d = data
        self._pos = pos
        self._acc = 0
        self._nav = 0
        self._stop: Exception | None = None

    def _fill(self, need: int) -> None:
        """Best-effort refill of the accumulator to ``need`` bits;
        records (does not raise) the stop condition — marker byte or
        end of buffer — exactly where the per-bit reader would have
        raised it."""
        d, p = self._d, self._pos
        acc, nav = self._acc, self._nav
        n = len(d)
        while nav < need:
            if p >= n:
                self._stop = IndexError("index out of range")
                break
            byte = d[p]
            p += 1
            if byte == 0xFF:
                if p >= n:
                    self._stop = IndexError("index out of range")
                    break
                nxt = d[p]
                if nxt == 0x00:
                    p += 1  # stuffed
                else:
                    p -= 1  # marker stays unconsumed
                    self._stop = ValueError(
                        f"unexpected marker 0xFF{nxt:02X} in entropy data"
                    )
                    break
            acc = (acc << 8) | byte
            nav += 8
        self._pos = p
        self._acc, self._nav = acc, nav

    def read_bits(self, n: int) -> int:
        if self._nav < n:
            self._fill(n)
            if self._nav < n:
                raise self._stop
        nav = self._nav - n
        v = self._acc >> nav
        self._acc &= (1 << nav) - 1
        self._nav = nav
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)


def _canonical_decode_table(bits: list[int], vals: list[int]):
    """DHT (BITS, HUFFVAL) → (mincode, maxcode, valptr, vals) arrays for
    the T.81 F.2.2.3 DECODE procedure, indexed by code length 1..16.
    ``mincode[l] <= code <= maxcode[l]`` is exactly the ``(code, l) in
    table`` test of the former dict walk (canonical codes are assigned
    consecutively per length), checked both-bounds so corrupt streams
    take the identical error path."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code, k = 0, 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            valptr[length] = k
            mincode[length] = code
            code += n
            k += n
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


def _decode_huffman(reader: _BitReader, table) -> int:
    """One Huffman symbol via the canonical-array walk: peek up to 16
    bits once, then length-extend with integer compares (no per-bit
    calls, no per-symbol dict probes)."""
    mincode, maxcode, valptr, vals = table
    if reader._nav < 16:
        reader._fill(16)
    m = reader._nav
    acc = reader._acc
    for length in range(1, 17):
        if length > m:
            raise reader._stop  # stream ended mid-code, as per-bit reader
        code = acc >> (m - length)
        if mincode[length] <= code <= maxcode[length]:
            nav = m - length
            reader._acc = acc & ((1 << nav) - 1)
            reader._nav = nav
            return vals[valptr[length] + code - mincode[length]]
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    """Inverse of magnitude coding (T.81 EXTEND)."""
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg_gray(buf: bytes) -> np.ndarray:
    """Baseline grayscale JPEG → (H, W) uint8 pixel array."""
    b = bytes(buf)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}
    dims: tuple[int, int] | None = None
    comp_q = 0
    scan_dc = scan_ac = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # conformant encoders may pad with 0xFF fill bytes before a
        # marker (ITU-T T.81 §B.1.1.2) — skip them
        while pos + 4 <= len(b) and b[pos + 1] == 0xFF:
            pos += 1
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", b, pos + 2)
        seg = b[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported 16-bit quant table")
                tbl = np.zeros(64, np.int64)
                tbl[_ZZ_FLAT] = np.frombuffer(seg, np.uint8, 64, off + 1)
                qtables[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8 or ncomp != 1:
                raise ValueError(
                    f"unsupported JPEG: precision={precision} components={ncomp} "
                    "(stdlib seam decodes 8-bit grayscale baseline)"
                )
            _cid, sampling, comp_q = seg[6], seg[7], seg[8]
            if sampling != 0x11:
                raise ValueError("unsupported subsampling")
            dims = (h, w)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("unsupported JPEG coding process (baseline only)")
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            off = 0
            while off < len(seg):
                cls, tid = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nvals])
                htables[(cls, tid)] = _canonical_decode_table(bits, vals)
                off += 17 + nvals
        elif marker == 0xDD:
            raise ValueError("unsupported restart interval")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            if ns != 1:
                raise ValueError("unsupported multi-component scan")
            scan_dc, scan_ac = seg[2] >> 4, seg[2] & 0x0F
            pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    else:
        raise ValueError("JPEG missing SOS")
    if dims is None:
        raise ValueError("JPEG missing SOF0")
    h, w = dims
    if h % 8 or w % 8:
        raise ValueError("unsupported non-multiple-of-8 dimensions")
    if comp_q not in qtables:
        raise ValueError(f"JPEG scan references missing quant table {comp_q}")
    if (0, scan_dc) not in htables or (1, scan_ac) not in htables:
        raise ValueError(
            f"JPEG scan references missing Huffman table dc={scan_dc} ac={scan_ac}"
        )
    q = qtables[comp_q]
    dc_tbl, ac_tbl = htables[(0, scan_dc)], htables[(1, scan_ac)]
    reader = _BitReader(b, pos)
    bh, bw = h // 8, w // 8
    # Entropy decode is inherently sequential (DC prediction chains
    # across blocks); collect per-block zigzag sequences as plain lists,
    # then dezigzag / dequantize / IDCT every block in ONE batched
    # NumPy pass (bit-identical to the per-block path — matmul
    # broadcasts per 8×8 slice; asserted in tests/test_jpeg_codec.py).
    if bh * bw == 0:
        return np.zeros((h, w), np.uint8)
    seqs: list[list[int]] = []
    pred = 0
    for _ in range(bh * bw):
        seq = [0] * 64
        size = _decode_huffman(reader, dc_tbl)
        diff = _extend(reader.read_bits(size), size) if size else 0
        pred += diff
        seq[0] = pred
        i = 1
        while i < 64:
            sym = _decode_huffman(reader, ac_tbl)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                i += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            i += run
            if i >= 64:
                raise ValueError("AC run past end of block")
            seq[i] = _extend(reader.read_bits(size), size)
            i += 1
        seqs.append(seq)
    flat = np.zeros((bh * bw, 64), np.int64)
    flat[:, _ZZ_FLAT] = np.array(seqs, np.int64)
    coeffs = (flat.reshape(bh * bw, 8, 8) * q).astype(np.float64)
    spatial = np.matmul(np.matmul(_A.T, coeffs), _A)
    pix = np.clip(np.floor(spatial + 128.5), 0, 255).astype(np.uint8)
    return np.ascontiguousarray(
        pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


# ------------------------------------------- deterministic fixture set
#
# The decode query's payloads depend only on event_id % 64: per 16×16
# image, block b (raster 0..3) carries DC = 8·(((kk·3 + 17·b) % 64) − 32)
# plus a fixed per-block AC pattern chosen to exercise short runs, long
# runs (ZRL), and a final-coefficient block with no EOB.

_AC_PATTERNS: list[dict[tuple[int, int], int]] = [
    {(0, 1): 40, (1, 0): -30, (3, 2): 12},
    {(0, 2): 25, (2, 2): -18, (5, 1): 9},
    {(1, 1): 33, (0, 3): -21, (4, 4): 7},
    {(2, 0): 28, (1, 3): -15, (7, 7): 5},  # (7,7): last zigzag, no EOB
]


def fixture_coeffs(kk: int) -> np.ndarray:
    """Quantized coefficient blocks (2, 2, 8, 8) for variant kk ∈ [0, 64)."""
    blocks = np.zeros((2, 2, 8, 8), np.int64)
    for b in range(4):
        blk = blocks[b // 2, b % 2]
        blk[0, 0] = 8 * (((kk * 3 + 17 * b) % 64) - 32)
        for (u, v), val in _AC_PATTERNS[b].items():
            blk[u, v] = val
    return blocks


def fixture_jpeg(kk: int) -> bytes:
    """The variant-kk 16×16 grayscale baseline JPEG."""
    return encode_jpeg_gray(fixture_coeffs(kk))
