"""Device-side LSM accumulator must match the host accumulator exactly."""

import numpy as np

from kmcex_tpu.core import codec
from kmcex_tpu.count.device_lsm import DeviceCountAccumulator, _merge_runs_kernel, _pad_run
from kmcex_tpu.count.extract import SENTINEL


def test_merge_runs_kernel():
    ka = np.array([1, 5, 9, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    ca = np.array([2, 3, 1, 0], dtype=np.uint32)
    kb = np.array([5, 7, 0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    cb = np.array([4, 1, 0, 0], dtype=np.uint32)
    u, c, n = _merge_runs_kernel(ka, ca, kb, cb)
    n = int(n)
    assert n == 4
    np.testing.assert_array_equal(np.asarray(u[:n]), [1, 5, 7, 9])
    np.testing.assert_array_equal(np.asarray(c[:n]), [2, 7, 1, 1])
    assert np.all(np.asarray(u[n:]) == 0xFFFFFFFFFFFFFFFF)


def test_device_accumulator_matches_numpy():
    rng = np.random.default_rng(0)
    k = 17
    acc = DeviceCountAccumulator(k)
    all_kmers = []
    for _ in range(7):
        codes = rng.integers(0, 4, size=(64, 80)).astype(np.uint8)
        codes[rng.random(codes.shape) < 0.03] = 255
        acc.add_batch(codes)
        # reference extraction on host
        from kmcex_tpu.count.extract import extract_canonical

        flat = np.asarray(extract_canonical(codes, k)[0])
        all_kmers.append(flat[flat != 0xFFFFFFFFFFFFFFFF])
    kmers, counts = acc.finalize(ci=1)
    want_k, want_c = np.unique(np.concatenate(all_kmers), return_counts=True)
    np.testing.assert_array_equal(kmers, want_k)
    np.testing.assert_array_equal(counts, want_c.astype(np.uint32))


def test_device_accumulator_ci_cs():
    rng = np.random.default_rng(1)
    k = 9
    acc = DeviceCountAccumulator(k)
    codes = np.tile(rng.integers(0, 4, size=(4, 40)).astype(np.uint8), (8, 1))
    acc.add_batch(codes)
    kmers, counts = acc.finalize(ci=3, cs=5)
    assert (counts >= 3).all() and (counts <= 5).all()
