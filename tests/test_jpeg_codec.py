"""First-principles pinning of the baseline JPEG codec
(``operators/jpeg.py``) — the oracle of ``multimodal_decode_jpeg``
embeds features computed by this same codec, so the codec itself must
be verified against INDEPENDENT math: a direct-form IDCT double loop,
the DC-only closed form, and structural JPEG invariants (canonical
Huffman validity, byte stuffing, marker handling)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators import jpeg


def test_zigzag_is_the_standard_order():
    assert jpeg.ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert jpeg.ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert sorted(jpeg.ZIGZAG) == [(u, v) for u in range(8) for v in range(8)]


def test_idct_matches_direct_form():
    """Matrix IDCT vs the T.81 definition written as four explicit
    loops with math.cos — different code path, same spec."""
    rng = np.random.RandomState(3)
    coeffs = rng.randint(-500, 500, size=(8, 8)).astype(float)
    ref = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = math.sqrt(0.5) if u == 0 else 1.0
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu * cv / 4.0 * coeffs[u, v]
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            ref[y, x] = s
    assert np.abs(jpeg._A.T @ coeffs @ jpeg._A - ref).max() < 1e-9


def test_dc_only_closed_form():
    """A DC-only block decodes to the flat value round(DC/8) + 128 —
    the hand-checkable special case."""
    for dc in (-256, -8, 0, 8, 96, 504):
        c = np.zeros((1, 1, 8, 8), np.int64)
        c[0, 0, 0, 0] = dc
        img = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(c))
        expected = int(np.clip(math.floor(dc / 8 + 128.5), 0, 255))
        assert (img == expected).all(), (dc, img[0, 0], expected)


def test_roundtrip_exact_random_blocks():
    rng = np.random.RandomState(7)
    for _ in range(10):
        c = rng.randint(-200, 200, size=(2, 3, 8, 8)).astype(np.int64)
        c[..., 0, 0] = rng.randint(-800, 800, size=(2, 3))
        img = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(c))
        exp = np.zeros((16, 24), np.uint8)
        for by in range(2):
            for bx in range(3):
                exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = jpeg.idct_block(
                    c[by, bx].astype(float)
                )
        assert (img == exp).all()


def test_quant_table_applied():
    rng = np.random.RandomState(11)
    q = np.arange(1, 65).reshape(8, 8)
    c = rng.randint(-20, 20, size=(1, 1, 8, 8)).astype(np.int64)
    img = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(c, quant=q))
    assert (img == jpeg.idct_block((c[0, 0] * q).astype(float))).all()


def test_byte_stuffing_roundtrip():
    """Entropy streams containing a raw 0xFF must be stuffed with 0x00
    and de-stuffed on decode. Seed/trial chosen so the stream really
    contains a stuffed byte (asserted, so the case cannot silently
    stop covering the path)."""
    rng = np.random.RandomState(0)
    for t in range(22):
        c = rng.randint(-100, 100, size=(1, 1, 8, 8)).astype(np.int64)
        data = jpeg.encode_jpeg_gray(c)
    assert b"\xff\x00" in data.split(b"\xff\xda")[1]
    assert (jpeg.decode_jpeg_gray(data) == jpeg.idct_block(c[0, 0].astype(float))).all()


def test_huffman_tables_are_canonical_and_safe():
    """No code may be all ones at its length (reserved by T.81), and
    the code set must be prefix-free."""
    for bits, vals in ((jpeg._DC_BITS, jpeg._DC_VALS), (jpeg._AC_BITS, jpeg._AC_VALS)):
        codes = jpeg.build_codes(bits, vals)
        assert len(codes) == len(vals)
        for code, length in codes.values():
            assert code != (1 << length) - 1, "all-ones code is reserved"
        seen = sorted((ln, code) for code, ln in codes.values())
        for (l1, c1), (l2, c2) in zip(seen, seen[1:]):
            if l1 == l2:
                assert c1 != c2
            else:
                assert c2 >> (l2 - l1) >= c1, "prefix collision"


def test_unsupported_shapes_raise():
    with pytest.raises(ValueError, match="missing SOI"):
        jpeg.decode_jpeg_gray(b"\x89PNG\r\n\x1a\n")
    # progressive SOF2 must be rejected, not mis-decoded
    prog = bytearray(jpeg.fixture_jpeg(0))
    idx = bytes(prog).index(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline only"):
        jpeg.decode_jpeg_gray(bytes(prog))


def test_fixture_pixels_never_clip():
    """The per-variant DC/AC recipe must keep every pixel strictly
    inside (0, 255): clipping would break the linearity the oracle
    lookup relies on being re-derivable."""
    for kk in range(64):
        img = jpeg.decode_jpeg_gray(jpeg.fixture_jpeg(kk))
        assert img.min() > 0 and img.max() < 255


def test_decode_image_bytes_routes_jpeg():
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators.multimodal import (
        decode_image_bytes,
    )

    img = decode_image_bytes(jpeg.fixture_jpeg(17))
    assert img.shape == (16, 16)
    assert (img == jpeg.decode_jpeg_gray(jpeg.fixture_jpeg(17))).all()


def test_fill_bytes_before_markers_are_skipped():
    """Conformant encoders may pad with 0xFF fill bytes before any
    marker (ITU-T T.81 §B.1.1.2) — the decoder must skip them
    (r6 ADVICE). Insert fill bytes before the DQT marker."""
    b = jpeg.fixture_jpeg(9)
    ref = jpeg.decode_jpeg_gray(b)
    dqt = b.index(b"\xff\xdb")
    padded = b[:dqt] + b"\xff\xff\xff" + b[dqt:]
    assert (jpeg.decode_jpeg_gray(padded) == ref).all()


def test_canonical_decode_table_matches_dict_walk():
    """The r12 fast decoder walks (mincode, maxcode, valptr) canonical
    arrays instead of a (code, length) dict; both must define EXACTLY
    the same code→symbol map over the full 16-bit code space."""
    for bits, vals in ((jpeg._DC_BITS, jpeg._DC_VALS), (jpeg._AC_BITS, jpeg._AC_VALS)):
        codes = jpeg.build_codes(bits, vals)  # symbol -> (code, length)
        dict_walk = {(code, ln): sym for sym, (code, ln) in codes.items()}
        mincode, maxcode, valptr, v = jpeg._canonical_decode_table(bits, vals)
        for ln in range(1, 17):
            for code in range(1 << ln):
                in_canon = mincode[ln] <= code <= maxcode[ln]
                sym = dict_walk.get((code, ln))
                assert in_canon == (sym is not None), (ln, code)
                if in_canon:
                    assert v[valptr[ln] + code - mincode[ln]] == sym


def test_batched_idct_bit_identical_to_per_block():
    """decode_jpeg_gray now runs one batched matmul IDCT over all
    blocks; it must be bit-identical to the per-block idct_block path
    (float64 matmul broadcasting preserves per-slice FP order)."""
    rng = np.random.RandomState(99)
    c = rng.randint(-2000, 2000, size=(12, 8, 8)).astype(np.float64)
    batch = np.matmul(np.matmul(jpeg._A.T, c), jpeg._A)
    pix = np.clip(np.floor(batch + 128.5), 0, 255).astype(np.uint8)
    for i in range(12):
        assert (pix[i] == jpeg.idct_block(c[i])).all()


def test_bitreader_accumulator_matches_per_bit_semantics():
    """The accumulator reader must de-stuff 0xFF00, return the same
    bits, and defer marker/end errors to consumption time — a decode
    that finishes exactly at the marker must NOT raise."""
    data = bytes([0b10110010, 0xFF, 0x00, 0b01000000, 0xFF, 0xD9])
    r = jpeg._BitReader(data, 0)
    assert r.read_bits(8) == 0b10110010
    assert r.read_bits(8) == 0xFF  # stuffed byte is data
    assert r.read_bits(8) == 0b01000000  # ends exactly at marker: no raise
    with pytest.raises(ValueError, match="unexpected marker 0xFFD9"):
        r.read_bits(1)
    r2 = jpeg._BitReader(bytes([0xAB]), 0)
    assert r2.read_bits(4) == 0xA
    with pytest.raises(IndexError):
        r2.read_bits(8)


def test_missing_tables_raise_valueerror_not_keyerror():
    """A scan referencing a quant/Huffman table id absent from DQT/DHT
    must raise the documented ValueError (r6 ADVICE: used to KeyError)."""
    b = bytearray(jpeg.fixture_jpeg(3))
    # SOF0 component quant-table id lives 10 bytes into the SOF0 seg
    sof = bytes(b).index(b"\xff\xc0")
    b[sof + 2 + 2 + 6 + 2] = 3  # comp_q -> undefined table id 3
    with pytest.raises(ValueError, match="missing quant table"):
        jpeg.decode_jpeg_gray(bytes(b))
    b2 = bytearray(jpeg.fixture_jpeg(3))
    sos = bytes(b2).index(b"\xff\xda")
    b2[sos + 2 + 2 + 2] = 0x33  # scan dc/ac table ids -> undefined 3/3
    with pytest.raises(ValueError, match="missing Huffman table"):
        jpeg.decode_jpeg_gray(bytes(b2))
