"""Pallas extract kernel == XLA extract (interpret mode on the CPU mesh)."""

import numpy as np

from kmcex_tpu.count import extract, extract_pallas


def _check(codes, k):
    got_k, got_n = extract_pallas.extract_canonical_fused(codes, k)
    want_k, want_n = extract.extract_canonical(codes, k)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    assert int(got_n) == int(want_n)


def test_fused_matches_xla_random():
    rng = np.random.default_rng(0)
    R = extract_pallas.ROW_TILE
    for k, L in [(31, 160), (21, 96), (15, 64), (32, 160), (11, 32)]:
        codes = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
        codes[rng.random(codes.shape) < 0.05] = 255  # N bases
        _check(codes, k)


def test_fused_matches_xla_packed():
    rng = np.random.default_rng(1)
    R = extract_pallas.ROW_TILE
    k, L = 31, 160
    codes = rng.integers(0, 4, size=(2 * R, L)).astype(np.uint8)
    codes[rng.random(codes.shape) < 0.03] = 255
    packed, maskbits = extract.pack_codes_np(codes)
    got_k, got_n = extract_pallas.extract_canonical_packed_fused(packed, maskbits, k)
    want_k, want_n = extract.extract_canonical_packed(packed, maskbits, k)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    assert int(got_n) == int(want_n)


def test_fused_all_invalid_and_all_valid_rows():
    R = extract_pallas.ROW_TILE
    k, L = 31, 160
    codes = np.zeros((R, L), dtype=np.uint8)
    codes[0, :] = 255                      # fully invalid read
    codes[1, :] = 3                        # poly-T (revcomp = poly-A wins)
    _check(codes, k)
