"""Device-side Bloom-bank build.

The reference inserts low-count k-mers into the Bloom pairs with atomic
scatter-ORs on the host (kmodel.hpp:473-506) — commutative and order-free,
which makes it the one piece of the encode that can leave the sequential
host schedule entirely.  Here the (nh-1) main-filter and (nh-2) back-filter
probe positions are computed on device straight from the counted table
(murmur over the regenerated ASCII form, exactly the host/native seed
schedule) and set into a device bitmap; only the FINISHED filter bytes
cross the device->host link.  On singleton-heavy real spectra ~80% of the
table's keys feed the Bloom bank (BENCH_r04), so this removes most of the
table transfer — the finished filters are ~5x smaller than the keys that
build them — and takes bloom insertion off the host entirely.

Bitmap strategy (measured on the v5e, tools/exp_device_bf.py): an XLA
scatter `.at[pos].set(1)` into a ONE-BYTE-PER-BIT bitmap runs at ~113M
positions/s (memory-latency bound, same ~9ns as a random gather) and is
trivially exact under duplicate positions.  All 2*bf_num filter tables
live at byte-aligned offsets in ONE flat bitmap so each tile needs ONE
scatter; table lengths and offsets are traced scalars, so one compiled
program serves every dataset of a given padded size.  The byte pack
(bit j of a byte is MSB-first, kmodel.hpp:576-588) runs on device; the
host pulls ready-to-use filter bytes, bit-identical to the host build
(order-independence makes parity free; asserted in tests).
"""

from __future__ import annotations

import functools

import numpy as np

from kmcex_tpu.model.bloom import BloomBank, bf_sizes

# Rows per feed dispatch: [TILE, (bf_num)*(2nh-3)] position tensors stay
# ~200MB at bf_num=3 while keeping dispatch count low.
TILE = 1 << 21

# Bitmaps are one byte per bit; beyond this capacity fall back to the host
# build (the disk-spill regimes never reach here anyway).
MAX_BITMAP_BYTES = 4 << 30


@functools.lru_cache(maxsize=None)
def _feed_program(k: int, ci: int, bf_num: int, n_hash: int):
    """Build the jitted per-tile feed: (u, c, t, lens, offs, bitmap) ->
    bitmap with this tile's probe bits set.  ``lens``/``offs`` are u64
    vectors of the 2*bf_num table bit-lengths and bitmap offsets (traced,
    so the program is reused across datasets)."""
    import jax
    import jax.numpy as jnp

    from kmcex_tpu.core import codec
    from kmcex_tpu.core.murmur import (
        HASH_SEEDS,
        murmur_eval_jnp,
        murmur_pre_jnp,
    )
    from kmcex_tpu.count.device_lsm import SENTINEL

    n_main = n_hash - 1
    n_back = n_hash - 2
    seeds_main = HASH_SEEDS[:n_main]
    seeds_back = HASH_SEEDS[:n_back]

    @jax.jit
    def feed(u, c, t, lens, offs, bitmap):
        ut = jax.lax.dynamic_slice(u, (t * TILE,), (TILE,))
        ct = jax.lax.dynamic_slice(c, (t * TILE,), (TILE,))
        real = ut != SENTINEL
        ascii_k = codec.ascii_bytes_jnp(ut, k)
        bl, tl = murmur_pre_jnp(ascii_k)
        h_main = murmur_eval_jnp(bl, tl, k, seeds_main)  # [T, nh-1]
        ascii_m = codec.ascii_bytes_jnp(codec.middle_kmer_jnp(ut, k), k - 2)
        blm, tlm = murmur_pre_jnp(ascii_m)
        h_back = murmur_eval_jnp(blm, tlm, k - 2, seeds_back)  # [T, nh-2]

        cap = bitmap.shape[0]
        dump = jnp.uint64(cap)  # mode="drop" swallows masked lanes
        pos_parts = []
        for i in range(bf_num):
            low = real & (ct == np.uint32(ci + i))
            pm = offs[2 * i] + h_main % lens[2 * i]
            pb = offs[2 * i + 1] + h_back % lens[2 * i + 1]
            pos_parts.append(jnp.where(low[:, None], pm, dump))
            pos_parts.append(jnp.where(low[:, None], pb, dump))
        pos = jnp.concatenate(pos_parts, axis=1).reshape(-1)
        return bitmap.at[pos].set(jnp.uint8(1), mode="drop")

    return feed


@functools.lru_cache(maxsize=None)
def _pack_program():
    """bits u8[cap] -> bytes u8[cap//8], MSB-first within each byte
    (reference set_bit/check_bit layout, kmodel.hpp:576-588)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def pack(bits):
        g = bits.reshape(-1, 8)
        out = jnp.zeros(g.shape[0], jnp.uint8)
        for j in range(8):
            out = out | (g[:, j] << np.uint8(7 - j))
        return out

    return pack


class DeviceBloomBuilder:
    """Accumulates the Bloom bank on device while the count table streams
    to the host encode.  Lifecycle:

        b = DeviceBloomBuilder(k, ci, n_hash, low_hist)   # after stats pull
        b.feed_table(u, c, n_real)     # device arrays from the finalize
        b.start_pull()                 # dispatch byte-pack + async pull
        b.into(bank)                   # fill a BloomBank's byte arrays

    Raises ValueError at construction when the bitmap would exceed
    MAX_BITMAP_BYTES (callers fall back to the host build)."""

    def __init__(self, k: int, ci: int, n_hash: int, low_hist):
        import jax
        import jax.numpy as jnp

        self.k = int(k)
        self.ci = int(ci)
        self.n_hash = int(n_hash)
        self.bf_num = 1 if ci == 1 else 3
        counts = np.zeros(3, dtype=np.uint64)
        counts[: self.bf_num] = np.asarray(low_hist)[: self.bf_num]
        self.byte_bf, self.byte_back = bf_sizes(counts[: self.bf_num], n_hash)
        # interleaved (main_i, back_i) byte-aligned offsets into one bitmap
        sizes_bits = []
        for i in range(self.bf_num):
            sizes_bits += [int(self.byte_bf[i]) * 8, int(self.byte_back[i]) * 8]
        offs = np.cumsum([0] + sizes_bits[:-1]).astype(np.uint64)
        total_bits = int(sum(sizes_bits))
        if total_bits > MAX_BITMAP_BYTES:
            raise ValueError(
                f"device bloom bitmap would need {total_bits} bytes")
        cap = 1 << max(3, (total_bits - 1).bit_length())
        self.total_bytes = total_bits // 8
        self._lens = jax.device_put(
            np.array(sizes_bits, dtype=np.uint64))
        self._offs = jax.device_put(offs)
        self._bitmap = jnp.zeros(cap, jnp.uint8)
        self._feed = _feed_program(self.k, self.ci, self.bf_num, self.n_hash)
        self._pack = _pack_program()
        self._pulled = None

    def feed_table(self, u, c, n_real: int) -> None:
        """Scatter the probe bits of every low-count key in ``u[:n_real]``
        (device arrays, SENTINEL-padded, sorted-unique).  Each key must be
        fed exactly once across all calls (duplicate POSITIONS are fine —
        set(1) is idempotent — duplicate KEYS are too, but signal an
        upstream bug)."""
        import jax.numpy as jnp

        size = int(u.shape[0])
        n = min(size, max(int(n_real), 0))
        n_tiles = -(-n // TILE)
        if size % TILE:
            pad = n_tiles * TILE - size
            if pad > 0:
                from kmcex_tpu.count.device_lsm import SENTINEL

                u = jnp.concatenate(
                    [u, jnp.full((pad,), SENTINEL, jnp.uint64)])
                c = jnp.concatenate([c, jnp.zeros((pad,), jnp.uint32)])
        for t in range(n_tiles):
            self._bitmap = self._feed(u, c, jnp.int32(t), self._lens,
                                      self._offs, self._bitmap)

    def start_pull(self) -> None:
        """Dispatch the byte pack and start the async device->host pull of
        the finished filter bytes (call right after the last feed; the pull
        overlaps the host encode)."""
        if self._pulled is None:
            b = self._pack(self._bitmap)[: self.total_bytes]
            b.copy_to_host_async()
            self._pulled = b

    def into(self, bank: BloomBank) -> None:
        """Fill ``bank``'s filter byte arrays (sizes must match: the bank
        must be built from the same low_hist/n_hash/ci)."""
        self.start_pull()
        data = np.asarray(self._pulled)
        off = 0
        for i in range(self.bf_num):
            for arr, nbytes in ((bank.bit_bf[i], int(self.byte_bf[i])),
                                (bank.bit_bf_back[i], int(self.byte_back[i]))):
                assert len(arr) == nbytes, "bank sized from different hist"
                arr[:] = data[off : off + nbytes]
                off += nbytes
