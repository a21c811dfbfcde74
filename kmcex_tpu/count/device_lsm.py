"""Device-resident LSM accumulation of (k-mer, count) runs.

Per-batch results never leave the device: sorted unique runs (padded with
SENTINEL to power-of-two sizes) are stacked like an LSM tree and merged
pairwise with a jitted concat -> sort -> segment-sum kernel whenever two
runs reach the same size class.  Only the final merged table is pulled to
the host, which matters here because device->host bandwidth (~20MB/s over
the axon relay on this rig) is orders of magnitude below device sort
throughput.

Segment sums use the same scatter-free formulation as
count/extract.sort_count_unique: run lengths/sums come from prefix sums +
reverse cummin over boundary positions, compaction from one key+payload
sort.  The number of distinct compiled shapes is logarithmic (power-of-two
sizes only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kmcex_tpu.count.extract import SENTINEL, extract_canonical, sort_count_unique


@jax.jit
def _merge_runs_kernel(ka, ca, kb, cb):
    """Merge two sorted (kmer, count) runs (SENTINEL-padded), summing
    duplicates; result padded to len(ka)+len(kb)."""
    k = jnp.concatenate([ka, kb])
    c = jnp.concatenate([ca, cb]).astype(jnp.uint32)
    k, c = jax.lax.sort((k, c), num_keys=1, is_stable=False)
    n = k.shape[0]
    idxs = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), k[1:] != k[:-1]])
    valid = first & (k != SENTINEL)
    n_real = jnp.sum(k != SENTINEL, dtype=jnp.int32)
    # segment count sums via cumsum differencing at boundaries
    csum = jnp.cumsum(c, dtype=jnp.uint64)
    bpos = jnp.where(first, idxs, n)
    next_b = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.concatenate([bpos[1:], jnp.array([n], jnp.int32)])))
    )
    seg_end = jnp.minimum(next_b, n_real)  # exclusive
    start_excl = jnp.where(idxs > 0, csum[jnp.maximum(idxs - 1, 0)], 0)
    seg_sum = csum[jnp.maximum(seg_end - 1, 0)] - start_excl
    seg_sum = jnp.where(seg_end > idxs, seg_sum, 0)
    counts = jnp.where(valid, seg_sum, 0)
    # saturate at uint32 (counters clamp to cs far below this anyway)
    counts32 = jnp.minimum(counts, jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    key = jnp.where(valid, k, SENTINEL)
    uniq, counts_c = jax.lax.sort((key, counts32), num_keys=1, is_stable=False)
    n_unique = jnp.sum(valid, dtype=jnp.int32)
    counts_c = jnp.where(idxs < n_unique, counts_c, 0)
    return uniq, counts_c, n_unique


@functools.partial(jax.jit, static_argnums=(2,))
def _pad_run(kmers, counts, size: int):
    n = kmers.shape[0]
    pk = jnp.full((size,), SENTINEL, dtype=jnp.uint64)
    pc = jnp.zeros((size,), dtype=jnp.uint32)
    return pk.at[:n].set(kmers), pc.at[:n].set(counts)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _count_batch_kernel(codes, k: int, pad_size: int):
    """Fused extract -> canonicalize -> sort -> segment-count -> pad.

    One XLA program (and one dispatch RPC) per input batch; the RPC latency
    on this rig (~26ms) makes call fusion worth as much as the compute."""
    kmers, n_valid = extract_canonical(codes, k)
    uniq, counts, n_unique = sort_count_unique(kmers)
    n = uniq.shape[0]
    if pad_size > n:
        pk = jnp.full((pad_size,), SENTINEL, dtype=jnp.uint64).at[:n].set(uniq)
        pc = jnp.zeros((pad_size,), dtype=jnp.uint32).at[:n].set(counts)
    else:
        pk, pc = uniq[:pad_size], counts[:pad_size]
    return pk, pc, n_valid


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class DeviceCountAccumulator:
    """Accumulates batches on device; one host transfer at finalize."""

    def __init__(self, k: int):
        self.k = k
        self.runs: list[tuple[jnp.ndarray, jnp.ndarray, int]] = []  # (k, c, size)
        self.total_windows = 0

    def add_batch(self, codes: np.ndarray) -> None:
        n_windows = codes.shape[0] * (codes.shape[1] - self.k + 1)
        size = _next_pow2(n_windows)
        uniq, counts, _ = _count_batch_kernel(codes, self.k, size)
        self.total_windows += n_windows
        self.runs.append((uniq, counts, size))
        self._rebalance()

    # Below this size, merges stay fully async (no host sync to learn the
    # unique count); above it, one scalar sync lets us shrink the pad so
    # memory and future merge cost track the true distinct-k-mer count.
    SHRINK_THRESHOLD = 1 << 23

    def _merge_top2(self) -> None:
        kb, cb, sb = self.runs.pop()
        ka, ca, sa = self.runs.pop()
        u, c, nu = _merge_runs_kernel(ka, ca, kb, cb)
        size = sa + sb
        if size >= self.SHRINK_THRESHOLD:
            shrunk = _next_pow2(max(int(nu), 1))  # scalar device sync
            if shrunk < size:
                u, c = u[:shrunk], c[:shrunk]
                size = shrunk
        self.runs.append((u, c, size))

    def _rebalance(self) -> None:
        while len(self.runs) >= 2 and self.runs[-2][2] <= self.runs[-1][2]:
            self._merge_top2()

    def finalize(self, ci: int = 1, cs: int = 0xFFFFFFFF) -> tuple[np.ndarray, np.ndarray]:
        while len(self.runs) >= 2:
            self._merge_top2()
        if not self.runs:
            return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint32)
        u, c, _ = self.runs[0]
        kmers = np.asarray(u)
        counts = np.asarray(c)
        real = kmers != np.uint64(0xFFFFFFFFFFFFFFFF)
        kmers, counts = kmers[real], counts[real]
        keep = counts >= ci
        kmers, counts = kmers[keep], counts[keep]
        return kmers, np.minimum(counts, cs).astype(np.uint32)
