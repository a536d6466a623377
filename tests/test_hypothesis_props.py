"""Hypothesis-driven invariants for the physics scalar library
(SURVEY §5.2): generated inputs, not just fixture rows. Values are
checked through a real Spark plan (createDataFrame → column
expressions → collect) so the tested artifact is the engine's
expression library, not a Python reimplementation."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from high_energy_gamma_ray_search_in_kascade_array_data_spark.functions import physics

_angles = st.floats(min_value=0.0, max_value=360.0, exclude_max=True,
                    allow_nan=False, allow_infinity=False)
_zeniths = st.floats(min_value=0.0, max_value=89.0,
                     allow_nan=False, allow_infinity=False)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(_zeniths, _angles), min_size=1, max_size=16))
def test_spherical_roundtrip_on_generated_angles(spark, pairs):
    """cartesian∘spherical ≈ id for any (ze, az) batch."""
    df = spark.createDataFrame(pairs, "ze double, az double")
    dx, dy, dz = physics.direction_cosines(F.col("ze"), F.col("az"))
    ze2, az2 = physics.cartesian_to_spherical(dx, dy, dz)
    rows = df.select("ze", "az", ze2.alias("ze2"), az2.alias("az2")).collect()
    for r in rows:
        # zenith tolerance: acos is ill-conditioned at dz→1 (pole) —
        # the reconstruction error bound is ~sqrt(machine eps) in
        # radians ≈ 1.2e-6 degrees, not machine eps itself
        assert math.isclose(r.ze, r.ze2, abs_tol=5e-6)
        d_az = abs(r.az - r.az2) % 360.0
        # azimuth is undefined at the pole (ze=0); tolerance scales
        assert min(d_az, 360.0 - d_az) < 1e-5 / max(math.sin(math.radians(r.ze)), 1e-9)


@settings(max_examples=5, deadline=None)
@given(st.lists(_angles, min_size=1, max_size=16), st.integers(min_value=0, max_value=7))
def test_rotation_composition_wraps(spark, azs, k):
    """k 90° steps ≡ one (k mod 4)·90° step, and output ∈ [0, 360)."""
    df = spark.createDataFrame([(a,) for a in azs], "az double")
    step = F.col("az")
    for _ in range(k):
        step = physics.rotate_azimuth(step, 1)
    direct = physics.rotate_azimuth(F.col("az"), k % 4)
    rows = df.select(step.alias("stepped"), direct.alias("direct")).collect()
    for r in rows:
        assert 0.0 <= r.stepped < 360.0
        assert math.isclose(r.stepped % 360.0, r.direct % 360.0, abs_tol=1e-9)


_edges = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(_edges)
def test_star_contraction_equals_propagation_random_graphs(spark, edges):
    """The two distributed CC engines agree on ARBITRARY generated
    graphs — self-loops included (a doc paired only with itself is a
    singleton component in BOTH engines), duplicates, multi-component,
    chains — not just the fixture's LSH cliques. Both contract:
    (doc_id, min reachable) for every doc appearing in ≥1 pair."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators import dedup as dd

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    prop = sorted(tuple(r) for r in dd.connected_components(pairs, max_iter=40).collect())
    star = sorted(tuple(r) for r in dd.connected_components_star(pairs, max_iter=40).collect())
    assert prop == star


# --------------------------- round-6 codec invariants (pure Python,
# no Spark plan needed: the kernels call these exact functions)

_bytes_payload = st.binary(min_size=0, max_size=2048)


@settings(max_examples=25, deadline=None)
@given(_bytes_payload)
def test_gif_lzw_roundtrip_on_generated_bytes(data):
    """decode∘encode == id for the GIF LZW coder on ANY byte string —
    covers dictionary growth, width bumps, clear-code resets and the
    KwKwK path without hand-picking cases."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators.gif import _lzw_decode, _lzw_encode

    assert _lzw_decode(_lzw_encode(data, 8), 8, len(data)) == data


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=512))
def test_wav_roundtrip_on_generated_samples(samples):
    """decode∘encode == id for the WAV container on any int16 sample
    vector (two's-complement edge values included)."""
    import numpy as np

    from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators.multimodal import (
        decode_wav_bytes,
        wav_header_hex,
    )

    pcm = b"".join(int(s % 65536).to_bytes(2, "little") for s in samples)
    rate, out = decode_wav_bytes(bytes.fromhex(wav_header_hex(len(samples))) + pcm)
    assert rate == 8000
    assert np.array_equal(out.astype(np.int64), np.array(samples, dtype=np.int64))


@settings(max_examples=10, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_gif_image_roundtrip_on_generated_shapes(h, w, seed):
    """Full-container GIF round-trip across arbitrary (H, W) shapes."""
    import numpy as np

    from high_energy_gamma_ray_search_in_kascade_array_data_spark.operators.gif import (
        decode_gif_gray,
        encode_gif_gray,
    )

    img = np.random.RandomState(seed % 2**31).randint(0, 256, (h, w)).astype(np.uint8)
    assert (decode_gif_gray(encode_gif_gray(img)) == img).all()
