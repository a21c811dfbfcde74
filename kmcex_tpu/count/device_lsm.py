"""Device-resident accumulation of (k-mer, count) runs.

Two-level design tuned for TPU sort throughput vs. the slow host link on
this rig (~33MB/s each way over the axon relay):

  * **Raw tier** — per input batch only the fused extract kernel runs; the
    flat canonical k-mer vectors stay in HBM unsorted.  When the tier
    reaches ``raw_tier_elems`` k-mers it is concatenated and collapsed by
    ONE sort + segment-count pass.  Counting per 8M batch and pairwise
    merging (the previous scheme) sorted every element ~6x; a large tier
    sorts each element ~2x (count pass + at most one merge per LSM level).
  * **LSM runs** — collapsed tiers are sorted unique runs, merged pairwise
    (concat -> sort -> segment-sum) whenever two reach the same size
    class, exactly like an LSM tree.  Memory stays bounded for
    genome-scale inputs while merge cost is amortized.

Only the final merged table is pulled to the host, counts narrowed to
uint16 when ``cs`` fits (half the transfer bytes; counters clamp to cs
anyway, kmodel.hpp:675).

Segment sums use the same scatter-free formulation as
count/extract.sort_count_unique: run lengths/sums come from prefix sums +
reverse cummin over boundary positions, compaction from one key+payload
sort.  The number of distinct compiled shapes is logarithmic (power-of-two
sizes only) plus one per distinct batches-per-tier count (bounded by
``raw_tier_elems // batch_elems``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kmcex_tpu.count.extract import (
    SENTINEL,
    extract_canonical,
    extract_canonical_packed,
    sort_count_unique,
)


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


@functools.partial(jax.jit, static_argnums=(1,))
def _extract_kernel(codes, k: int):
    """Fused extract -> canonicalize; the flat k-mer vector stays in HBM."""
    kmers, _ = extract_canonical(codes, k)
    return kmers


@functools.partial(jax.jit, static_argnums=(2,))
def _extract_kernel_packed(packed, maskbits, k: int):
    kmers, _ = extract_canonical_packed(packed, maskbits, k)
    return kmers


@jax.jit
def _collapse_kernel(kmers_list):
    """Concat a raw tier and collapse to a sorted unique run."""
    flat = jnp.concatenate(kmers_list) if len(kmers_list) > 1 else kmers_list[0]
    uniq, counts, n_unique = sort_count_unique(flat)
    return uniq, counts, n_unique.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _pack_final(kmers, counts, cs: int, narrow: bool):
    c = jnp.minimum(counts, jnp.uint32(cs))
    if narrow:
        c = c.astype(jnp.uint16)
    return kmers, c


@jax.jit
def _final_stats(kmers, counts, ci):
    """One fused pass over the final table: encode-sizing stats (the
    reference's pass 1, kmodel.hpp:423-434) plus the delta-transfer
    parameters, so one tiny pull decides everything before table bytes move.

    Returns (total pairs >= ci, histogram of counter==ci+i for i<3, n_real,
    max_gap between consecutive real k-mers, first k-mer)."""
    valid = (kmers != SENTINEL) & (counts >= ci)
    total = jnp.sum(valid, dtype=jnp.int64)
    hist = jnp.stack(
        [jnp.sum(valid & (counts == ci + i), dtype=jnp.int64) for i in range(3)]
    )
    real = kmers != SENTINEL  # contiguous prefix: sentinels sort last
    n_real = jnp.sum(real, dtype=jnp.int64)
    idx = jnp.arange(kmers.shape[0])
    prev = jnp.concatenate([kmers[:1], kmers[:-1]])
    gap = jnp.where(real & (idx > 0), kmers - prev, 0)
    max_gap = jnp.max(gap)
    return total, hist, n_real, max_gap, kmers[0]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _delta_pack(kmers, counts, wbytes: int, n_chunks: int, cs: int, narrow: bool):
    """Bitpack the sorted table for transfer over the slow host link:
    consecutive-k-mer deltas at ``wbytes`` bytes each (byte-aligned
    little-endian; the sorted table's gaps are far below 2^64) plus clamped
    counts, both reshaped to n_chunks rows for async chunked pulls.  The
    native kx_decode_deltas reverses it at memory speed."""
    d = kmers - jnp.concatenate([kmers[:1], kmers[:-1]])
    d = jnp.where(jnp.arange(kmers.shape[0]) == 0, 0, d)  # first sent via stats
    kb = jnp.stack(
        [((d >> jnp.uint64(8 * j)) & jnp.uint64(0xFF)).astype(jnp.uint8)
         for j in range(wbytes)],
        axis=1,
    )  # [n, wbytes]
    c = jnp.minimum(counts, jnp.uint32(cs))
    if narrow:
        c = c.astype(jnp.uint16)
    return kb.reshape(n_chunks, -1), c.reshape(n_chunks, -1)


@functools.partial(jax.jit, static_argnums=(2,))
def _split_rows(kmers, counts, n_chunks: int):
    return kmers.reshape(n_chunks, -1), counts.reshape(n_chunks, -1)


@jax.jit
def _take_row(x, i):
    return jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class DeviceCountAccumulator:
    """Accumulates batches on device; one host transfer at finalize."""

    # Raw k-mers buffered in HBM before one sort+count pass (512MB at u64).
    RAW_TIER_ELEMS = 64 << 20
    # Below this size, merges stay fully async (no host sync to learn the
    # unique count); above it, one scalar sync lets us shrink the pad so
    # memory and future merge cost track the true distinct-k-mer count.
    SHRINK_THRESHOLD = 1 << 23
    # Runs at or above this many entries leave HBM: they are pulled to host
    # RAM and merged there by the native two-pointer merge.  Genome-scale
    # tables (NA12878 31-mers: billions of distinct k-mers) cannot live on
    # one chip; the device stays a fast "memtable" level of the LSM.
    SPILL_THRESHOLD = 128 << 20

    def __init__(self, k: int, raw_tier_elems: int | None = None,
                 spill_threshold: int | None = None):
        self.k = k
        self.raw_tier_elems = raw_tier_elems or self.RAW_TIER_ELEMS
        self.spill_threshold = spill_threshold or self.SPILL_THRESHOLD
        self.raw: list[jnp.ndarray] = []
        self.raw_elems = 0
        self.runs: list[tuple[jnp.ndarray, jnp.ndarray, int]] = []  # (k, c, size)
        self.host_runs: list[tuple[np.ndarray, np.ndarray]] = []
        self.total_windows = 0

    def add_batch(self, codes) -> None:
        n_windows = codes.shape[0] * (codes.shape[1] - self.k + 1)
        kmers = _extract_kernel(codes, self.k)
        self._push_raw(kmers, n_windows)

    def add_batch_packed(self, packed, maskbits) -> None:
        """2-bit packed input (see extract.pack_codes_np): L = 4 * packed
        width."""
        L = packed.shape[1] * 4
        n_windows = packed.shape[0] * (L - self.k + 1)
        kmers = _extract_kernel_packed(packed, maskbits, self.k)
        self._push_raw(kmers, n_windows)

    def _push_raw(self, kmers, n_windows: int) -> None:
        self.total_windows += n_windows
        self.raw.append(kmers)
        self.raw_elems += n_windows
        if self.raw_elems >= self.raw_tier_elems:
            self._collapse_raw()

    def _collapse_raw(self) -> None:
        if not self.raw:
            return
        uniq, counts, nu = _collapse_kernel(self.raw)
        size = uniq.shape[0]
        self.raw = []
        self.raw_elems = 0
        if size >= self.SHRINK_THRESHOLD:
            shrunk = _next_pow2(max(int(nu), 1))  # scalar device sync
            if shrunk < size:
                uniq, counts = uniq[:shrunk], counts[:shrunk]
                size = shrunk
        # runs must be pow2-padded so merge shape classes stay logarithmic
        psize = _next_pow2(size)
        if psize != size:
            pad = psize - size
            uniq = jnp.concatenate([uniq, jnp.full((pad,), SENTINEL, jnp.uint64)])
            counts = jnp.concatenate([counts, jnp.zeros((pad,), jnp.uint32)])
            size = psize
        if size >= self.spill_threshold:
            self._spill(uniq, counts)
        else:
            self.runs.append((uniq, counts, size))
            self._rebalance()

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
        if size >= self.spill_threshold:
            self._spill(u, c)
        else:
            self.runs.append((u, c, size))

    def _spill(self, u, c) -> None:
        """Pull a device run to host RAM and fold it into the host LSM level
        (native two-pointer merge; raw counts — ci/cs apply at finalize)."""
        ku = np.asarray(u)
        kc = np.asarray(c).astype(np.uint32, copy=False)
        real = ku != np.uint64(0xFFFFFFFFFFFFFFFF)
        ku, kc = ku[real], kc[real]
        if not len(ku):
            return
        self.host_runs.append((ku, kc))
        from kmcex_tpu import native

        while (len(self.host_runs) >= 2
               and len(self.host_runs[-2][0]) < 2 * len(self.host_runs[-1][0])):
            kb, cb = self.host_runs.pop()
            ka, ca = self.host_runs.pop()
            self.host_runs.append(native.merge_runs(ka, ca, kb, cb))

    def _rebalance(self) -> None:
        while len(self.runs) >= 2 and self.runs[-2][2] <= self.runs[-1][2]:
            self._merge_top2()

    def _merge_device_runs(self):
        """Collapse raw tier and merge device runs down to at most one."""
        self._collapse_raw()
        while len(self.runs) >= 2:
            self._merge_top2()

    def _finalize_host(self) -> tuple[np.ndarray, np.ndarray] | None:
        """When spills happened: fold any remaining device run into the host
        level and merge host runs to one.  Returns raw (kmers, counts) or
        None when nothing spilled."""
        if not self.host_runs:
            return None
        if self.runs:
            u, c, _ = self.runs.pop()
            self._spill(u, c)
        from kmcex_tpu import native

        while len(self.host_runs) >= 2:
            kb, cb = self.host_runs.pop()
            ka, ca = self.host_runs.pop()
            self.host_runs.append(native.merge_runs(ka, ca, kb, cb))
        return self.host_runs[0]

    def finalize(self, ci: int = 1, cs: int = 0xFFFFFFFF) -> tuple[np.ndarray, np.ndarray]:
        self._merge_device_runs()
        host = self._finalize_host()
        if host is not None:
            kmers, counts = host
            keep = counts >= ci
            return kmers[keep], np.minimum(counts[keep], np.uint32(cs))
        if not self.runs:
            return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint32)
        u, c, _ = self.runs[0]
        narrow = cs < (1 << 16)
        u, c = _pack_final(u, c, int(cs), narrow)
        kmers = np.asarray(u)
        counts = np.asarray(c).astype(np.uint32)
        real = kmers != np.uint64(0xFFFFFFFFFFFFFFFF)
        kmers, counts = kmers[real], counts[real]
        keep = counts >= ci
        return kmers[keep], counts[keep]

    def finalize_stream(self, ci: int = 1, cs: int = 0xFFFFFFFF, n_chunks: int = 8):
        """Streaming finalize: returns (total, low_hist, chunk_iter) where
        ``chunk_iter`` yields (kmers, counts) numpy chunks in ascending-k-mer
        order, already ci-filtered and cs-clamped.

        The table crosses the slow host link (~33MB/s relay here) as
        byte-aligned k-mer deltas + narrowed counts, in async chunked pulls
        started up front; all-padding rows are never transferred; consuming
        a chunk (feeding the model encoder) overlaps later transfers."""
        self._merge_device_runs()
        host = self._finalize_host()
        if host is not None:
            kmers, counts = host
            valid = counts >= ci
            total = int(np.count_nonzero(valid))
            hist = np.array(
                [np.count_nonzero(counts == ci + i) for i in range(3)],
                dtype=np.int64,
            )
            m = max(1, -(-len(kmers) // max(n_chunks, 1)))

            def hit():
                for a in range(0, len(kmers), m):
                    ku = kmers[a : a + m]
                    kc = counts[a : a + m]
                    keep = kc >= ci
                    yield ku[keep], np.minimum(kc[keep], np.uint32(cs))

            return total, hist, hit()
        if not self.runs:
            return 0, np.zeros(3, dtype=np.int64), iter(())
        u, c, size = self.runs[0]
        total, hist, n_real, max_gap, first = _final_stats(u, c, np.uint32(ci))
        total = int(total)
        hist = np.asarray(hist)
        n_real = int(n_real)
        if n_real == 0:
            return 0, hist, iter(())
        wbytes = max(1, (int(max_gap).bit_length() + 7) // 8)
        first = int(first)
        while n_chunks > 1 and size % n_chunks:
            n_chunks -= 1
        narrow = cs < (1 << 16)
        krows, crows = _delta_pack(u, c, wbytes, n_chunks, int(cs), narrow)
        m = size // n_chunks  # entries per row
        rows = []
        for i in range(n_chunks):
            if i * m >= n_real:
                break  # trailing rows are pure padding; skip the transfer
            su = _take_row(krows, i)
            sc = _take_row(crows, i)
            su.copy_to_host_async()
            sc.copy_to_host_async()
            rows.append((su, sc))

        def it():
            from kmcex_tpu import native

            base = np.uint64(first)
            for i, (su, sc) in enumerate(rows):
                kb = np.asarray(su)
                kc = np.asarray(sc).astype(np.uint32)
                n_here = min(n_real - i * m, m)
                ku = native.decode_deltas(kb, n_here, wbytes, int(base))
                base = ku[-1]
                keep = kc[:n_here] >= ci
                yield ku[keep], kc[:n_here][keep]

        return total, hist, it()
