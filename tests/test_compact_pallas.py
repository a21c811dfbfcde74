"""Shift-compaction kernel (count/compact_pallas) vs brute force, interpret
mode on CPU with shrunken blocks — same harness as test_sort_pallas."""

import numpy as np
import pytest
import jax.numpy as jnp

from kmcex_tpu.count import compact_pallas as cp
from kmcex_tpu.count import sort_pallas as sp

S = np.uint64(0xFFFFFFFFFFFFFFFF)


@pytest.fixture(autouse=True)
def small_blocks(monkeypatch):
    monkeypatch.setattr(sp, "BLK", 1 << 10)
    monkeypatch.setattr(sp, "INTERPRET", True)


def _check(keys, counts):
    gk, gc = cp.compact_pairs(jnp.asarray(keys), jnp.asarray(counts))
    gk, gc = np.asarray(gk), np.asarray(gc)
    live = keys != S
    wk, wc = keys[live], counts[live]
    n = len(wk)
    np.testing.assert_array_equal(gk[:n], wk)
    np.testing.assert_array_equal(gc[:n], wc)
    assert (gk[n:] == S).all()
    assert (gc[n:] == 0).all()


@pytest.mark.parametrize("n,frac,seed", [
    (1 << 10, 0.5, 0), (1 << 12, 0.1, 1), (1 << 12, 0.9, 2),
    (3000, 0.3, 3), ((1 << 12) - 7, 0.5, 4), (1000, 0.0, 5), (2048, 1.0, 6),
])
def test_compact_random(n, frac, seed):
    """compact_pairs' contract: valid keys ascending + distinct (what the
    sorted, boundary-marked pipeline arrays look like), holes anywhere."""
    rng = np.random.default_rng(seed)
    keys = np.sort(rng.choice(1 << 62, size=n, replace=False).astype(np.uint64))
    counts = rng.integers(0, 1 << 31, n).astype(np.uint32)
    holes = rng.random(n) < frac
    keys[holes] = S
    counts[holes] = 0
    _check(keys, counts)


def test_compact_sorted_with_dup_holes():
    """The actual pipeline shape: ascending keys, duplicate slots holed."""
    rng = np.random.default_rng(42)
    base = np.sort(rng.integers(0, 1 << 62, 4096, dtype=np.uint64))
    rep = rng.integers(1, 5, 4096)
    s = np.repeat(base, rep)[: 1 << 12]
    first = np.concatenate([[True], s[1:] != s[:-1]])
    keys = np.where(first, s, S)
    counts = np.where(first, rng.integers(1, 100, len(s)), 0).astype(np.uint32)
    _check(keys, counts)


def test_compact_hole_runs():
    """Long alternating runs of holes/survivors (worst case for shifts)."""
    n = 1 << 12
    keys = np.arange(n, dtype=np.uint64)
    counts = np.ones(n, dtype=np.uint32)
    keys[: n // 2] = S  # entire first half holes -> max displacement
    counts[: n // 2] = 0
    _check(keys, counts)
    keys2 = np.arange(n, dtype=np.uint64)
    counts2 = np.ones(n, dtype=np.uint32)
    keys2[n // 2 :] = S  # second half holes -> zero displacement
    counts2[n // 2 :] = 0
    _check(keys2, counts2)


def test_segmented_finalize_pallas_path(monkeypatch):
    """The TPU segmented finalize (sorted_boundary -> per-segment
    compact_pairs -> packed pull) end-to-end in interpret mode — the exact
    branch the real chip runs, vs brute force."""
    monkeypatch.setattr(sp, "use_pallas_sort", lambda: True)
    from kmcex_tpu.count import device_lsm
    from kmcex_tpu.count.device_lsm import DeviceCountAccumulator

    rng = np.random.default_rng(77)
    k = 13
    acc = DeviceCountAccumulator(k)
    acc.FINALIZE_SEGMENTS = 4
    flats = []
    for _ in range(3):
        codes = rng.integers(0, 4, size=(64, 48)).astype(np.uint8)
        codes[rng.random(codes.shape) < 0.02] = 255
        acc.add_batch(codes)
        from kmcex_tpu.count import extract

        f = np.asarray(extract.extract_canonical(jnp.asarray(codes), k)[0])
        flats.append(f[f != S])
    total, hist, chunks = acc.finalize_stream(ci=1, cs=1023)
    got_k, got_c = [], []
    for ku, kc in chunks:
        got_k.append(ku)
        got_c.append(kc)
    got_k = np.concatenate(got_k) if got_k else np.zeros(0, np.uint64)
    got_c = np.concatenate(got_c) if got_c else np.zeros(0, np.uint32)
    want_k, want_c = np.unique(np.concatenate(flats), return_counts=True)
    np.testing.assert_array_equal(got_k, want_k)
    np.testing.assert_array_equal(got_c, want_c.astype(np.uint32))
    assert total == len(want_k)
    for i in range(3):
        assert hist[i] == int(np.count_nonzero(want_c == 1 + i))


def test_tile_run_lsm_incremental_merges(monkeypatch):
    """The at-arrival tile-run LSM (per-flush ascending sort + pairwise
    single-stage bitonic merges) must equal brute force across uneven
    flush sizes, forced raw-tier collapses, and the no-merge-tree
    finalize — in interpret mode, the exact branch the chip runs."""
    monkeypatch.setattr(sp, "use_pallas_sort", lambda: True)
    from kmcex_tpu.count import device_lsm, extract
    from kmcex_tpu.count.device_lsm import DeviceCountAccumulator

    rng = np.random.default_rng(99)
    k = 13
    acc = DeviceCountAccumulator(k)
    flats = []
    sizes = [(64, 48), (192, 48), (32, 48), (96, 48), (64, 48)]
    for rows, L in sizes:
        codes = rng.integers(0, 4, size=(rows, L)).astype(np.uint8)
        codes[rng.random(codes.shape) < 0.03] = 255
        acc.add_batch(codes)
        f = np.asarray(extract.extract_canonical(jnp.asarray(codes), k)[0])
        flats.append(f[f != S])
    assert len(acc.tile_runs) >= 1  # flushes happened
    n_merges_left = len(acc.tile_runs) - 1
    total, hist, chunks = acc.finalize_stream(ci=1, cs=1023)
    got_k = np.concatenate([x[0] for x in chunks])
    want_k, want_c = np.unique(np.concatenate(flats), return_counts=True)
    np.testing.assert_array_equal(got_k, want_k)
    assert total == len(want_k)

    # forced mid-stream collapse exercises _collapse_sorted_run too
    acc2 = DeviceCountAccumulator(k, raw_tier_elems=4096)
    flats2 = []
    for rows, L in sizes * 2:
        codes = rng.integers(0, 4, size=(rows, L)).astype(np.uint8)
        acc2.add_batch(codes)
        f = np.asarray(extract.extract_canonical(jnp.asarray(codes), k)[0])
        flats2.append(f[f != S])
    got2_k, got2_c = acc2.finalize(ci=1, cs=1023)
    want2_k, want2_c = np.unique(np.concatenate(flats2), return_counts=True)
    np.testing.assert_array_equal(got2_k, want2_k)
    np.testing.assert_array_equal(got2_c, want2_c.astype(np.uint32))


def test_compact_exhaustive_tiny_blocks(monkeypatch):
    """Every hole pattern of a 2-block array at blk=256 lanes... exhaustive
    over 12-slot patterns embedded in the first block: catches any
    collision/stale-copy bug in the log-shift kernel that random sampling
    might miss (the move schedule only depends on the hole pattern)."""
    monkeypatch.setattr(sp, "BLK", 1 << 8)
    monkeypatch.setattr(sp, "INTERPRET", True)
    n = 2 << 8  # TWO blocks: the hole patterns also drive nonzero
    # dynamic_update_slice stitch offsets, not just the in-block kernel
    for pat in range(0, 1 << 12, 7):  # stride keeps runtime ~1min
        keys = np.arange(n, dtype=np.uint64) * 3 + 1
        counts = (np.arange(n) % 251 + 1).astype(np.uint32)
        holes = np.zeros(n, bool)
        for b in range(12):
            if (pat >> b) & 1:
                holes[b * 21 % n] = True
        # also hole a deterministic tail pattern tied to pat
        if pat % 3 == 0:
            holes[200:300] = True
        keys[holes] = S
        counts[holes] = 0
        _check(keys, counts)
