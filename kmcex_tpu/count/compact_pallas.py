"""TPU stream compaction: move every non-SENTINEL (key, count) pair to the
front, stably, filling the tail with (SENTINEL, 0).

This replaces the counting pipeline's second full bitonic sort: after the
key sort + segment-count pass (count/extract.segment_compact), duplicate
slots are SENTINEL-marked and the survivors must be compacted.  Re-sorting
globally (the round-2 approach) costs the full O(n log^2 n) 3-plane network
again (~0.6s for 32M pairs on v5e).  Compaction exploits what that re-sort
ignores: the array is ALREADY globally sorted, so

  * within each 2^18-element block, one forced-ascending bitonic block sort
    (sort_pallas._block_sort, 3 planes, in VMEM) pushes the SENTINEL holes
    to the block tail — valid keys are distinct and ascending, so the sort
    IS the stable compaction;
  * NO cross-block merge tree is needed: block b's survivors all precede
    block b+1's.  Blocks are stitched by a sequential chain of in-place
    dynamic_update_slice writes (a fori_loop carry — XLA updates the carry
    buffer in place): block b's full 2^18 slots land at offset
    sum(v_0..v_{b-1}), so block b+1's real data overwrites block b's
    SENTINEL tail and the final tail stays (SENTINEL, 0) from the init.

That drops the cross-block merge stages (~40% of a full sort) and one
plane of traffic vs the re-sort.

Negative results recorded (round 3, this rig):
  * a log-shift move kernel (displacement = hole prefix sum; 18 conditional
    roll steps, provably collision-free) is ~8x cheaper arithmetically, but
    Mosaic compiles it pathologically — 9 MINUTES statically unrolled, >23
    as a traced-shift fori_loop — and tripped three x64 lowering bugs on
    the way (bool*bool recursion in _convert_helper, i64 roll shifts, i64
    semaphore indices);
  * a pallas HBM->HBM DMA stitch fails outright: Mosaic requires DMA slice
    offsets divisible by the rank-1 tiling (1024 elements), and compaction
    offsets are arbitrary.  dynamic_update_slice handles unaligned offsets
    and XLA keeps the loop-carry update in place.

No reference counterpart: the reference counts in the external kmc binary
(SURVEY.md §2 C2); this is part of its TPU-native replacement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kmcex_tpu.count import sort_pallas

LANES = 128


def compact_pairs(keys: jnp.ndarray, counts: jnp.ndarray):
    """Stable compaction of (u64 keys, u32 counts): non-SENTINEL entries
    move to the front in order, tail filled with (SENTINEL, 0).  Output
    length = input length rounded up to whole blocks.

    PRECONDITION: the non-SENTINEL keys are globally ascending and distinct
    (true for the sorted-and-boundary-marked arrays this pipeline produces)
    — the per-block sort restores each block's order and cross-block order
    is inherited."""
    blk = sort_pallas.BLK
    n = keys.shape[0]
    total = max(blk, -(-n // blk) * blk)
    if total > n:
        keys = jnp.concatenate(
            [keys, jnp.full((total - n,), sort_pallas.SENTINEL64, jnp.uint64)])
        counts = jnp.concatenate(
            [counts, jnp.zeros((total - n,), jnp.uint32)])
    B = total // blk
    r = blk // LANES
    # per-block survivor counts -> destination offsets (cheap XLA reduce)
    v = jnp.sum(
        (keys != sort_pallas.SENTINEL64).reshape(B, blk), axis=1,
        dtype=jnp.int32)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(v)[:-1].astype(jnp.int32)])

    hi = (keys >> jnp.uint64(32)).astype(jnp.uint32).reshape(B, r, LANES)
    lo = keys.astype(jnp.uint32).reshape(B, r, LANES)
    cnt = counts.reshape(B, r, LANES)
    # forced-ascending per-block sort: holes (SENTINEL) to each block's tail
    shi, slo, scnt = sort_pallas._block_sort((hi, lo, cnt), 3, True)
    # logical column-major tile order -> natural memory order per block.
    # The stitch runs on the u32 planes: dynamic_update_slice of uint64
    # fails at runtime on this TPU backend (no native 64-bit lanes).
    nhi = shi.transpose(0, 2, 1).reshape(-1)
    nlo = slo.transpose(0, 2, 1).reshape(-1)
    ncnt = scnt.transpose(0, 2, 1).reshape(-1)

    def body(b, planes):
        oh, ol, oc = planes
        off = offsets[b]
        hb = jax.lax.dynamic_slice(nhi, (b * blk,), (blk,))
        lb = jax.lax.dynamic_slice(nlo, (b * blk,), (blk,))
        cb = jax.lax.dynamic_slice(ncnt, (b * blk,), (blk,))
        return (jax.lax.dynamic_update_slice(oh, hb, (off,)),
                jax.lax.dynamic_update_slice(ol, lb, (off,)),
                jax.lax.dynamic_update_slice(oc, cb, (off,)))

    sent32 = jnp.uint32(0xFFFFFFFF)
    init = (jnp.full((total,), sent32, jnp.uint32),
            jnp.full((total,), sent32, jnp.uint32),
            jnp.zeros((total,), jnp.uint32))
    oh, ol, oc = jax.lax.fori_loop(0, B, body, init)
    out_k = (oh.astype(jnp.uint64) << jnp.uint64(32)) | ol.astype(jnp.uint64)
    return out_k, oc
