"""TPU stream compaction: move every non-SENTINEL (key, count) pair to the
front, stably, filling the tail with (SENTINEL, 0).

This replaces the counting pipeline's second full bitonic sort: after the
key sort + segment-count pass (count/extract.segment_compact), duplicate
slots are SENTINEL-marked and the survivors must be compacted.  Re-sorting
globally (the round-2 approach) costs the full O(n log^2 n) 3-plane network
again (~0.6s for 32M pairs on v5e).  Compaction exploits what that re-sort
ignores: the array is ALREADY globally sorted, so per-block compaction +
cheap stitching suffices:

  * PRIMARY (default): a receiver-centric LOG-SHIFT kernel per 2^18 block
    (_shift_compact_kernel) — each survivor's displacement is the hole
    prefix sum, applied LSB-to-MSB as ~log2(blk) roll-and-pull passes.
    O(log blk) single-roll passes instead of the block-sort network's
    O(log^2 blk) compare-exchanges.  An earlier round-3 formulation of the
    same idea was a recorded negative result (Mosaic compiled it in 9-23
    MINUTES); what fixed the pathology: receiver-centric pulls instead of
    conditional scatters, i32 mask algebra (no vector bools), traced roll
    distances inside two fori_loops (lane-stride then sublane-stride), and
    row-major logical order so no transposes surround the kernel.
  * FALLBACK (KMCEX_COMPACT_SORT=1): one forced-ascending bitonic block
    sort (sort_pallas._block_sort, 3 planes, in VMEM) pushes the SENTINEL
    holes to each block's tail — valid keys are distinct and ascending, so
    the sort IS the stable compaction.  This was the round-3 default and
    stays as the semantics cross-check.
  * Either way NO cross-block merge tree is needed: block b's survivors
    all precede block b+1's.  Blocks are stitched by a sequential chain of
    in-place dynamic_update_slice writes (a fori_loop carry — XLA updates
    the carry buffer in place): block b's full 2^18 slots land at offset
    sum(v_0..v_{b-1}), so block b+1's real data overwrites block b's
    SENTINEL tail and the final tail stays (SENTINEL, 0) from the init.

Remaining negative result (round 3, this rig): a pallas HBM->HBM DMA
stitch fails outright — Mosaic requires DMA slice offsets divisible by the
rank-1 tiling (1024 elements), and compaction offsets are arbitrary.
dynamic_update_slice handles unaligned offsets and XLA keeps the
loop-carry update in place.

No reference counterpart: the reference counts in the external kmc binary
(SURVEY.md §2 C2); this is part of its TPU-native replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmcex_tpu.count import sort_pallas

LANES = 128


def _shift_compact_kernel(*refs, n_planes, blk):
    """Receiver-centric log-shift compaction of one block (ROW-major
    logical order: element i at tile[i // 128, i % 128]).

    Each survivor's displacement d (holes before it, an exclusive prefix
    sum computed outside in XLA; 0 at holes) rides along as an extra
    plane; for bit j from LOW to HIGH, every slot i pulls the element at
    i + 2^j iff that SOURCE's displacement has bit j set.  Three facts
    make this exact:

      * LSB-to-MSB order: after bits 0..j-1, survivor p sits at
        p - (d_p mod 2^j); for survivors p < q,
        c(q)-c(p) >= (q-p) - (d_q-d_p) >= 1 (d is monotone and counts at
        most one hole per slot), so survivor paths never collide.
        (MSB-first is NOT collision-free: mod-2^j wraps can put a later
        element exactly 2^j above an earlier one mid-flight.)
      * holes carry d = 0, so they never move and never overwrite.
      * a slot whose element moved away with no arrival zeroes its OWN d
        (the stale copy is "dead"), so duplicates never move again; they
        are overwritten by arrivals or masked out at the end.

    Slots past the block's live count v are set to (SENTINEL, 0).
    ~log2(blk) single-roll passes instead of the block-sort network's
    O(log^2 blk) compare-exchanges.

    Differences from the round-3 negative-result attempt (which Mosaic
    compiled pathologically): receiver-centric pulls (no conditional
    scatter), i32 mask algebra throughout, traced roll distances inside
    two fori_loops (lane-stride then sublane-stride), and row-major
    logical order so no transposes surround the kernel."""
    ins = refs[: n_planes + 1]          # data planes + v (live count)
    outs = refs[n_planes + 1 :]
    planes = tuple(ref[0] for ref in ins[:n_planes])
    vv = ins[n_planes][0]               # [1, LANES] i32 live count
    r = planes[0].shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    idx = row * LANES + lane            # row-major logical index
    nlog = blk.bit_length() - 1
    lb = LANES.bit_length() - 1         # 7
    one = jnp.int32(1)
    zero = jnp.int32(0)

    def apply_step(pls, rolled, j, valid_i):
        d_src = rolled[-1]
        bit = (d_src >> j) & 1
        arrived = (bit * valid_i) == 1
        d_self = pls[-1]
        self_moved = (d_self >> j) & 1
        new = [jnp.where(arrived, y, x)
               for y, x in zip(rolled[:-1], pls[:-1])]
        # vacated slot with no arrival -> dead (d = 0): stale copies of a
        # moved survivor must never move again
        d_stay = jnp.where(self_moved == 1, zero, d_self)
        new_d = jnp.where(arrived, d_src, d_stay)
        return (*new, new_d)

    # strides 2^j for j = 0 .. lb-1: lane roll + one-row carry
    def lane_body(j, pls):
        s = one << j
        rolled = []
        for x in pls:
            a = pltpu.roll(x, jnp.int32(LANES) - s, 1)
            b = pltpu.roll(a, jnp.int32(r) - 1, 0)
            rolled.append(jnp.where(lane < jnp.int32(LANES) - s, a, b))
        valid_i = jnp.where(idx < jnp.int32(blk) - s, one, zero)
        return apply_step(pls, rolled, j, valid_i)

    planes = jax.lax.fori_loop(jnp.int32(0), jnp.int32(min(lb, nlog)),
                               lane_body, planes)

    # strides 2^j for j = lb .. nlog-1: pure sublane roll by 2^(j-lb)
    def sub_body(j, pls):
        q = one << (j - lb)
        rolled = [pltpu.roll(x, jnp.int32(r) - q, 0) for x in pls]
        valid_i = jnp.where(row < jnp.int32(r) - q, one, zero)
        return apply_step(pls, rolled, j, valid_i)

    planes = jax.lax.fori_loop(jnp.int32(lb), jnp.int32(max(nlog, lb)),
                               sub_body, planes)

    live = idx < vv  # [r,128] vs [1,128] broadcast
    sent = jnp.uint32(0xFFFFFFFF)
    outs[0][0] = jnp.where(live, planes[0], sent)   # key hi
    outs[1][0] = jnp.where(live, planes[1], sent)   # key lo
    outs[2][0] = jnp.where(live, planes[2], jnp.uint32(0))  # count


@functools.partial(jax.jit, static_argnums=(5,))
def _shift_compact(hi, lo, cnt, d, v, blk: int):
    """[B, R, 128] planes (+ per-block live counts v [B]) -> compacted
    per-block planes in natural row-major order."""
    B, r, _ = hi.shape
    vv = jnp.broadcast_to(v.astype(jnp.int32)[:, None, None], (B, 1, LANES))
    spec = pl.BlockSpec((1, r, LANES), lambda b: (b, b * 0, b * 0),
                        memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 1, LANES), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_shift_compact_kernel, n_planes=4, blk=blk),
        grid=(B,),
        in_specs=[spec] * 4 + [vspec],
        out_specs=tuple([spec] * 3),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, r, LANES), jnp.uint32) for _ in range(3)
        ),
        input_output_aliases=sort_pallas._aliases(3),
        compiler_params=None if sort_pallas.INTERPRET
        else sort_pallas._COMPILER_PARAMS,
        interpret=sort_pallas.INTERPRET,
    )(hi, lo, cnt, d, vv)


import os as _os

# KMCEX_COMPACT_SORT=1 falls back to the block-sort compaction (the round-3
# default) instead of the log-shift kernel.  Resolved once at import.
_USE_SORT_COMPACT = _os.environ.get("KMCEX_COMPACT_SORT", "0") == "1"


def compact_pairs(keys: jnp.ndarray, counts: jnp.ndarray):
    """Stable compaction of (u64 keys, u32 counts): non-SENTINEL entries
    move to the front in order, tail filled with (SENTINEL, 0).  Output
    length = input length rounded up to whole blocks.

    PRECONDITION: the non-SENTINEL keys are globally ascending and distinct
    (true for the sorted-and-boundary-marked arrays this pipeline produces)
    — per-block compaction preserves each block's order and cross-block
    order is inherited."""
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
    hole = (keys == sort_pallas.SENTINEL64).reshape(B, blk)
    csum = jnp.cumsum(hole.astype(jnp.int32), axis=1)
    # per-block survivor counts -> destination offsets (cheap XLA reduce)
    v = jnp.int32(blk) - csum[:, -1]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(v)[:-1].astype(jnp.int32)])

    hi = (keys >> jnp.uint64(32)).astype(jnp.uint32).reshape(B, r, LANES)
    lo = keys.astype(jnp.uint32).reshape(B, r, LANES)
    cnt = counts.reshape(B, r, LANES)
    if _USE_SORT_COMPACT:
        # forced-ascending per-block sort: holes (SENTINEL) to the tail.
        # The sort's logical order is column-major, so transpose back.
        shi, slo, scnt = sort_pallas._block_sort((hi, lo, cnt), 3, True)
        nhi = shi.transpose(0, 2, 1).reshape(-1)
        nlo = slo.transpose(0, 2, 1).reshape(-1)
        ncnt = scnt.transpose(0, 2, 1).reshape(-1)
    else:
        # log-shift move kernel: displacement = exclusive prefix sum of
        # holes (row-major logical order == natural order, no transposes);
        # holes carry d = 0 so they never move (see _shift_compact_kernel)
        h32 = hole.astype(jnp.int32)
        d = ((csum - h32) * (1 - h32)).reshape(B, r, LANES)
        shi, slo, scnt = _shift_compact(hi, lo, cnt, d, v, blk)
        nhi = shi.reshape(-1)
        nlo = slo.reshape(-1)
        ncnt = scnt.reshape(-1)
    # The stitch runs on the u32 planes: dynamic_update_slice of uint64
    # fails at runtime on this TPU backend (no native 64-bit lanes).

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
