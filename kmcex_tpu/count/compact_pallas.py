"""Pallas TPU stream compaction: move every non-SENTINEL (key, count) pair
to the front, stably, filling the tail with (SENTINEL, 0).

This replaces the counting pipeline's second full bitonic sort: after the
key sort + segment-count pass (count/extract.segment_compact), duplicate
slots are SENTINEL-marked and the survivors must be compacted.  Re-sorting
(the round-2 approach) costs the full O(n log^2 n) 3-plane network again
(~0.6s for 32M pairs on v5e); compaction is fundamentally cheaper — every
element's displacement is known up front (the exclusive prefix sum of holes
before it), so log2(BLK) conditional roll-steps realize the permutation:

  * per 2^18-element block, in VMEM: displacement d = exclusive flat prefix
    sum of holes (Hillis-Steele scans along lanes then rows), then 18 steps
    j = 0..17 move each element down by 2^j when bit j of its d is set.
    Elements only ever land on slots whose final owner has not settled yet
    (valid elements keep strictly increasing positions: for i < i',
    pos_j(i') - pos_j(i) = (i'-i) - (d_i' mod 2^j - d_i mod 2^j) >= 1,
    because a non-wrapped mod-difference is <= d_i' - d_i <= i'-i-1 and a
    wrapped one is negative), so arrivals may clobber only stale copies and
    holes — never a settled survivor.  Wrap-around writes of the circular
    rolls land at flat index >= N - 2^j, and movers exist at step j only
    when the block has >= 2^j holes, i.e. when those slots are in the
    SENTINEL tail anyway.
  * blocks are then stitched by a SEQUENTIAL grid of HBM->HBM DMAs: block b
    copies its full 2^18 slots to offset sum(v_0..v_{b-1}); because the TPU
    grid runs in order on one core, block b+1's real data overwrites block
    b's SENTINEL tail, and the final tail is SENTINEL/0 by construction.

Total cost ~18 roll+select steps + 2 HBM passes, ~20x less compute than the
re-sort.  No reference counterpart: the reference counts in the external
kmc binary (SURVEY.md §2 C2); this is part of its TPU-native replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmcex_tpu.count import sort_pallas

import numpy as np

LANES = 128
# plain numpy scalar: a jnp constant would be captured as a pallas const
SENT32 = np.uint32(0xFFFFFFFF)


def _blk() -> int:
    # share sort_pallas's block size (tests shrink it + flip INTERPRET there)
    return sort_pallas.BLK


def _roll_from_above(x, s: int, axis: int):
    """y[i] = x[(i + s) mod size] along ``axis`` (static s)."""
    size = x.shape[axis]
    return pltpu.roll(x, size - s, axis)


def _flat_roll_down(x, s: int, lane_pos):
    """y[flat p] = x[(p + s) mod N] in natural row-major order
    (flat = row * 128 + lane); wrapped slots are don't-care by the hole
    argument in the module docstring."""
    r = x.shape[0]
    if s % LANES == 0:
        return _roll_from_above(x, s // LANES, 0)
    sl = s % LANES
    a = _roll_from_above(x, sl, 1)          # x[row, lane+s] (mod lanes)
    if s // LANES:
        a = _roll_from_above(a, s // LANES, 0)
    b = _roll_from_above(a, 1, 0)           # one row further down
    return jnp.where(lane_pos + sl < LANES, a, b)


def _scan_incl(x, axis: int):
    """Inclusive Hillis-Steele prefix sum of an i32 tile along ``axis``."""
    size = x.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    s = 1
    while s < size:
        shifted = pltpu.roll(x, s, axis)    # x[i - s]
        x = x + jnp.where(pos >= s, shifted, 0)
        s *= 2
    return x


def _compact_kernel(hi_ref, lo_ref, cnt_ref, ohi_ref, olo_ref, ocnt_ref,
                    ov_ref):
    hi, lo, cnt = hi_ref[0], lo_ref[0], cnt_ref[0]
    r = hi.shape[0]
    n = r * LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    flat = row * LANES + lane

    is_sent = jnp.where((hi == SENT32) & (lo == SENT32), jnp.int32(1),
                        jnp.int32(0))
    # d = exclusive prefix count of holes in flat order: in-row inclusive
    # scan + per-row offsets (inclusive row-total scan shifted by one row)
    row_incl = _scan_incl(is_sent, 1)
    row_tot = jax.lax.broadcast_in_dim(row_incl[:, LANES - 1], (r, LANES), (0,))
    tot_incl = _scan_incl(row_tot, 0)  # lanes identical -> row-total scan
    d = (tot_incl - row_tot) + (row_incl - is_sent)
    v = n - jnp.sum(is_sent)  # survivors in this block

    steps = (n - 1).bit_length()
    for j in range(steps):  # static unroll: every roll shift is a constant
        s = 1 << j
        valid = jnp.where((hi == SENT32) & (lo == SENT32), jnp.int32(0),
                          jnp.int32(1))
        move = valid * ((d >> j) & 1)
        arr_move = _flat_roll_down(move, s, lane)
        take = arr_move == 1
        hi = jnp.where(take, _flat_roll_down(hi, s, lane), hi)
        lo = jnp.where(take, _flat_roll_down(lo, s, lane), lo)
        cnt = jnp.where(take, _flat_roll_down(cnt, s, lane), cnt)
        d = jnp.where(take, _flat_roll_down(d, s, lane), d)

    keep = flat < v
    ohi_ref[0] = jnp.where(keep, hi, SENT32)
    olo_ref[0] = jnp.where(keep, lo, SENT32)
    ocnt_ref[0] = jnp.where(keep, cnt, jnp.uint32(0))
    ov_ref[0, 0] = v


@functools.partial(jax.jit, static_argnums=())
def _compact_blocks(hi, lo, cnt):
    """[B, R, 128] planes -> per-block compacted planes + [B] valid counts."""
    B, r, _ = hi.shape
    spec = pl.BlockSpec((1, r, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _compact_kernel,
        grid=(B,),
        in_specs=[spec] * 3,
        out_specs=(spec, spec, spec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct(hi.shape, jnp.uint32),
            jax.ShapeDtypeStruct(lo.shape, jnp.uint32),
            jax.ShapeDtypeStruct(cnt.shape, jnp.uint32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        compiler_params=None if sort_pallas.INTERPRET else
        sort_pallas._COMPILER_PARAMS,
        interpret=sort_pallas.INTERPRET,
    )(hi, lo, cnt)


def _stitch_kernel(off_ref, hi_ref, lo_ref, cnt_ref, ohi_ref, olo_ref,
                   ocnt_ref, sem):
    """Sequential-grid stitch: block b's full slot range DMAs to its global
    offset; later blocks overwrite earlier blocks' SENTINEL tails."""
    b = pl.program_id(0)
    blk = _blk()
    src = pl.ds(b * blk, blk)
    dst = pl.ds(off_ref[b], blk)
    copies = [
        pltpu.make_async_copy(hi_ref.at[src], ohi_ref.at[dst], sem.at[0]),
        pltpu.make_async_copy(lo_ref.at[src], olo_ref.at[dst], sem.at[1]),
        pltpu.make_async_copy(cnt_ref.at[src], ocnt_ref.at[dst], sem.at[2]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def _stitch(offsets, hi_f, lo_f, cnt_f, B: int):
    n = hi_f.shape[0]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        _stitch_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[any_spec] * 3,
            out_specs=(any_spec,) * 3,
            scratch_shapes=[pltpu.SemaphoreType.DMA((3,))],
        ),
        out_shape=(jax.ShapeDtypeStruct((n,), jnp.uint32),) * 3,
        compiler_params=pltpu.CompilerParams(has_side_effects=True)
        if sort_pallas.INTERPRET else pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=sort_pallas.INTERPRET,
    )(offsets, hi_f, lo_f, cnt_f)


def compact_pairs(keys: jnp.ndarray, counts: jnp.ndarray):
    """Stable compaction of (u64 keys, u32 counts): non-SENTINEL entries
    move to the front in order, tail filled with (SENTINEL, 0).  Output
    length = input length rounded up to whole blocks."""
    blk = _blk()
    n = keys.shape[0]
    total = max(blk, -(-n // blk) * blk)
    if total > n:
        keys = jnp.concatenate(
            [keys, jnp.full((total - n,), sort_pallas.SENTINEL64, jnp.uint64)])
        counts = jnp.concatenate(
            [counts, jnp.zeros((total - n,), jnp.uint32)])
    B = total // blk
    r = blk // LANES
    hi = (keys >> jnp.uint64(32)).astype(jnp.uint32).reshape(B, r, LANES)
    lo = keys.astype(jnp.uint32).reshape(B, r, LANES)
    cnt = counts.reshape(B, r, LANES)
    chi, clo, ccnt, v = _compact_blocks(hi, lo, cnt)
    v = v.reshape(-1)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(v)[:-1].astype(jnp.int32)])
    shi, slo, scnt = _stitch(offsets, chi.reshape(-1), clo.reshape(-1),
                             ccnt.reshape(-1), B)
    # slots past the last block's write window were never written: mask them
    idx = jnp.arange(total, dtype=jnp.int32)
    written = idx < offsets[B - 1] + blk
    out_k = jnp.where(
        written,
        (shi.astype(jnp.uint64) << jnp.uint64(32)) | slo.astype(jnp.uint64),
        sort_pallas.SENTINEL64,
    )
    out_c = jnp.where(written, scnt, jnp.uint32(0))
    return out_k, out_c
