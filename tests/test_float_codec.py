"""Lossless float codec (codecs/floats.py): bit-exact round trips,
mode selection, corruption handling, and the list-column pipeline."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fsst_ray.codecs.floats import (
    _MODE_DECIMAL,
    _MODE_PLANES,
    decode_float_payload,
    encode_float_chunk,
)


def _roundtrip(values: np.ndarray) -> dict:
    payload, meta = encode_float_chunk(values)
    decoded = decode_float_payload(payload)
    assert decoded.dtype == values.dtype
    assert decoded.tobytes() == values.tobytes(), "not bit-exact"
    return meta


def test_empty_both_widths():
    for dt in (np.float32, np.float64):
        _roundtrip(np.zeros(0, dtype=dt))


def test_decimal_mode_engages_on_two_decimal_doubles():
    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(0, 50, 4096), 2)
    meta = _roundtrip(vals)
    assert meta["codec"].startswith("fdecimal2"), meta
    assert meta["bytes_out"] * 3 < meta["bytes_in"], meta  # >3x on 2-decimal data


def test_decimal_mode_integers_pexp_zero():
    meta = _roundtrip(np.arange(1000, dtype=np.float64))
    assert meta["codec"].startswith("fdecimal0"), meta


def test_plane_mode_on_random_mantissas_compresses_exponent_plane():
    rng = np.random.default_rng(3)
    vals = (rng.standard_normal(8192) * 0.1).astype(np.float32)
    meta = _roundtrip(vals)
    assert meta["codec"] == "fplane"
    # normalized floats share few sign/exponent bytes: MSB plane must
    # beat plain (dict/RLE), so total size is under raw
    assert meta["bytes_out"] < meta["bytes_in"], meta


def test_special_values_bit_exact():
    vals = np.array(
        [0.0, -0.0, np.nan, -np.nan, np.inf, -np.inf, 5e-324, 1.7976931348623157e308],
        dtype=np.float64,
    )
    meta = _roundtrip(vals)
    assert meta["codec"] == "fplane"  # nan blocks decimal promotion


def test_nan_payload_preserved():
    # a non-default quiet-NaN payload must survive (pure byte permutation)
    raw = struct.pack("<I", 0x7FC00123)
    vals = np.frombuffer(raw * 16, dtype=np.float32)
    _roundtrip(vals)


def test_negative_zero_blocks_decimal():
    vals = np.array([1.0, 2.0, -0.0], dtype=np.float64)
    payload, meta = encode_float_chunk(vals)
    assert meta["codec"] == "fplane"  # -0.0 cannot reconstruct from int 0
    out = decode_float_payload(payload)
    assert np.signbit(out[2])


def test_rejects_non_float():
    with pytest.raises(TypeError):
        encode_float_chunk(np.arange(4, dtype=np.int32))


def test_corrupt_version_and_truncation():
    payload, _ = encode_float_chunk(np.ones(64, dtype=np.float32) * 0.7)
    bad = bytearray(payload)
    bad[0] = 99
    with pytest.raises(ValueError, match="version"):
        decode_float_payload(bytes(bad))
    with pytest.raises(ValueError):
        decode_float_payload(payload[: len(payload) // 2])


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.floats(width=32, allow_nan=True, allow_infinity=True),
        min_size=0,
        max_size=300,
    )
)
def test_property_f32_bit_exact(vals):
    _roundtrip(np.array(vals, dtype=np.float32))


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True),
        min_size=0,
        max_size=300,
    )
)
def test_property_f64_bit_exact(vals):
    _roundtrip(np.array(vals, dtype=np.float64))


@settings(max_examples=80, deadline=None)
@given(
    st.integers(min_value=0, max_value=4),
    st.lists(st.integers(min_value=-10**7, max_value=10**7), min_size=1, max_size=200),
)
def test_property_decimal_family_roundtrip(p, ints):
    vals = np.array(ints, dtype=np.float64) / 10.0**p
    meta = _roundtrip(vals)
    assert meta["codec"].startswith("fdecimal"), meta


def test_mode_bytes_in_frame():
    payload, _ = encode_float_chunk(np.round(np.linspace(0, 9, 100), 1))
    assert payload[1] == _MODE_DECIMAL
    payload, _ = encode_float_chunk(np.frombuffer(np.random.default_rng(0).bytes(400), dtype=np.float32))
    assert payload[1] == _MODE_PLANES


def test_float_list_pipeline_handles_empty_and_trailing_empty_lists(ray_session):
    import ray.data as rd

    from fsst_ray.pipelines.text_codec import float_list_roundtrip_groupby

    tbl = pa.table(
        {
            "label": pa.array([1, 1, 2, 2], type=pa.int32()),
            "embedding": pa.array(
                [[0.5, -0.25], [], [1.5], []], type=pa.list_(pa.float32())
            ),
        }
    )
    out = float_list_roundtrip_groupby(rd.from_arrow(tbl), "embedding", "label")
    got = {
        (r["label"], r["n"]): r["checksum"]
        for r in out.to_pylist()
    }
    # label 1: floor(.5e6)*1 + floor(-.25e6)*2 = 500000 - 500000 = 0 over 2 rows
    assert got[(1, 2)] == 0
    # label 2: floor(1.5e6)*1 = 1500000
    assert got[(2, 2)] == 1_500_000
