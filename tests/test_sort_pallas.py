"""Pallas bitonic sort/merge kernels, exercised in interpret mode on CPU
with a shrunken block size (the real TPU path runs the same network; see
count/sort_pallas.py).  Covers the three entry points the counting engine
uses: full key sort, key+payload sort, and the sorted-run merge."""

import numpy as np
import pytest
import jax.numpy as jnp

from kmcex_tpu.count import sort_pallas as sp


@pytest.fixture(autouse=True)
def small_blocks(monkeypatch):
    monkeypatch.setattr(sp, "BLK", 1 << 10)
    monkeypatch.setattr(sp, "INTERPRET", True)


@pytest.mark.parametrize("n", [1000, 1 << 10, 3000, (1 << 12) - 7])
def test_sort_u64(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 1 << 63, n, dtype=np.uint64)
    out = np.asarray(sp.sort_u64(jnp.asarray(x)))
    assert len(out) >= n and np.array_equal(out[:n], np.sort(x))
    # padded tail is all SENTINEL
    assert (out[n:] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()


def test_sort_u64_sentinel_keys_sort_last():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 63, 2000, dtype=np.uint64)
    x[::5] = np.uint64(0xFFFFFFFFFFFFFFFF)  # masked windows
    out = np.asarray(sp.sort_u64(jnp.asarray(x)))[:2000]
    assert np.array_equal(out, np.sort(x))


@pytest.mark.parametrize("n", [1000, 5000])
def test_sort_u64_with_payload(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 1 << 62, n, dtype=np.uint64)
    p = np.arange(n, dtype=np.uint32)
    k, pay = sp.sort_u64_with_payload(jnp.asarray(x), jnp.asarray(p))
    k, pay = np.asarray(k)[:n], np.asarray(pay)[:n]
    assert np.array_equal(k, np.sort(x))
    assert np.array_equal(x[pay], k)  # payload followed its key


@pytest.mark.parametrize("la,lb", [(1000, 500), (1 << 10, 1 << 10),
                                   (3000, 1700), (1, 1)])
def test_merge_sorted(la, lb):
    rng = np.random.default_rng(la * 31 + lb)
    a = np.sort(rng.integers(0, 1 << 63, la, dtype=np.uint64))
    b = np.sort(rng.integers(0, 1 << 63, lb, dtype=np.uint64))
    ca = rng.integers(0, 1000, la, dtype=np.uint32)
    cb = rng.integers(0, 1000, lb, dtype=np.uint32)
    k, pay = sp.merge_sorted_u64(jnp.asarray(a), jnp.asarray(ca),
                                 jnp.asarray(b), jnp.asarray(cb))
    k, pay = np.asarray(k), np.asarray(pay)
    n = la + lb
    allk = np.concatenate([a, b])
    allc = np.concatenate([ca, cb])
    order = np.argsort(allk, kind="stable")
    assert np.array_equal(k[:n], allk[order])
    import collections

    got = collections.Counter(zip(k[:n].tolist(), pay[:n].tolist()))
    exp = collections.Counter(zip(allk[order].tolist(), allc[order].tolist()))
    assert got == exp


def test_merge_sentinel_padded_runs():
    # LSM runs are SENTINEL-padded; merging two of them must keep all real
    # keys ahead of every sentinel.
    rng = np.random.default_rng(3)
    S = np.uint64(0xFFFFFFFFFFFFFFFF)
    a = np.sort(rng.integers(0, 1 << 62, 900, dtype=np.uint64))
    b = np.sort(rng.integers(0, 1 << 62, 700, dtype=np.uint64))
    ap = np.concatenate([a, np.full(124, S)])
    bp = np.concatenate([b, np.full(300, S)])
    ca = np.ones(len(ap), np.uint32)
    cb = np.ones(len(bp), np.uint32)
    k, _ = sp.merge_sorted_u64(jnp.asarray(ap), jnp.asarray(ca),
                               jnp.asarray(bp), jnp.asarray(cb))
    k = np.asarray(k)
    n = len(a) + len(b)
    assert np.array_equal(k[:n], np.sort(np.concatenate([a, b])))
    assert (k[n : len(ap) + len(bp)] == S).all()
