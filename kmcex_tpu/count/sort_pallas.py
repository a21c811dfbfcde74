"""Pallas TPU bitonic merge-sort for packed k-mer keys.

XLA's generic 64-bit sort is the hottest device op in the counting engine
(count/device_lsm: the raw-tier collapse sorts every extracted window;
count/extract.segment_compact re-sorts for compaction).  This module
replaces it with a hand-scheduled bitonic network:

  * keys are split into (hi, lo) uint32 planes — the TPU VPU has no native
    64-bit lanes, so one u64 compare becomes three u32 compares, all
    vectorized;
  * each 2^18-element block is sorted entirely in VMEM by one kernel
    (the classic bitonic network; partner exchange via ``pltpu.roll`` on
    the sublane/lane axes — no scatters, which TPUs lack);
  * cross-block stages run as grid passes over HBM with the pair of
    blocks DMA'd into one tile (a strided BlockSpec over a reshaped
    view), the last cross-block stride fused with the full within-block
    finishing network so each bitonic stage costs ~one HBM round-trip;
  * merging two already-sorted runs skips straight to the final stage
    (concat with the second run reversed = a bitonic sequence), which is
    how the LSM levels in count/device_lsm merge runs at a fraction of a
    full re-sort.

The logical element order inside a block is column-major (element i of a
block lives at tile[i % R, i // R]): the most frequent exchange strides
(1, 2, 4, ...) then run along the sublane axis where rolls are cheapest,
and only the 7 largest in-block strides cross lanes.  Input order is
irrelevant (the data is unsorted); the single transpose back to natural
order is paid once at the end.

Sorting here is the TPU-native replacement for the reference pipeline's
external-memory sort inside the kmc binary (invoked main.cpp:137-140;
the binary itself is a missing blob, SURVEY.md §2 C2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLK = 1 << 18          # elements per block (VMEM tile = [R, 128] per plane)

SENTINEL32 = np.uint32(0xFFFFFFFF)
SENTINEL64 = jnp.uint64(0xFFFFFFFFFFFFFFFF)

# Interpret mode for CPU unit tests (tests shrink BLK and flip this).
INTERPRET = False

# The block-sort network holds several live [R,128] u32 temporaries per
# plane; the default 16MB scoped-VMEM limit is too small for 2^18-element
# blocks.  v5e has 128MB VMEM — allow most of it.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

# KMCEX_PALLAS_NO_ALIAS=1 drops input_output_aliases from every pallas call
# (outputs allocated fresh instead of donating inputs).  Diagnostic knob for
# this rig's relay backend, which intermittently fails executions in long
# donated-buffer chains with an opaque INVALID_ARGUMENT.
import os as _os_alias

_NO_ALIAS = _os_alias.environ.get("KMCEX_PALLAS_NO_ALIAS", "0") == "1"


def _aliases(n_planes: int):
    return {} if _NO_ALIAS else {i: i for i in range(n_planes)}


def _r() -> int:
    return BLK // LANES


def _lt_i(ah, al, bh, bl):
    """(ah, al) < (bh, bl) 64-bit compare on u32 planes, as an i32 0/1
    mask.  All mask algebra in this module runs in i32: Mosaic has no
    vector-i1 storage, so bool-bool ops / selects-of-bools lower through
    an i8->i1 trunc it rejects.  Only the final plane select consumes a
    bool (a raw cmpi feeding select over u32 operands — supported)."""
    one = jnp.int32(1)
    zero = jnp.int32(0)
    # where(cond,1,0) not astype: bool->i32 convert recurses forever in
    # this Mosaic version's _convert_helper.
    lt_hi = jnp.where(ah < bh, one, zero)
    eq_hi = jnp.where(ah == bh, one, zero)
    lt_lo = jnp.where(al < bl, one, zero)
    return lt_hi + eq_hi * lt_lo


def _stride_step(planes, axis, sh, jj, asc_i, idx):
    """One bitonic compare-exchange at logical element stride 2^jj inside a
    [r, 128] column-major tile (element i at [i % r, i // r]).

    ``sh`` — TRACED i32 roll distance along ``axis`` (static 0/1); sublane
    strides (2^jj < r) roll axis 0 by 2^jj, lane strides roll axis 1 by
    2^jj / r.  ``jj`` is the traced logical stride log2 (for the pair-half
    mask).  ``asc_i`` is an i32 0/1 [r, 128] tensor: 1 where the enclosing
    k-run sorts ascending.  Partner lookup is two circular rolls + select
    (wraparound values are never selected: pairing is XOR within aligned
    2^(jj+1) groups).  Traced shifts keep the kernel MLIR O(1) per step —
    a fully unrolled 2^18 network took Mosaic >10min to compile."""
    h, l = planes[0], planes[1]
    is_b = (idx >> jj) & 1  # i32 0/1: upper half of pair
    size = planes[0].shape[axis]
    take_b = is_b == 1
    partners = [
        jnp.where(take_b, pltpu.roll(x, sh, axis),
                  pltpu.roll(x, jnp.int32(size) - sh, axis))
        for x in planes
    ]
    ph, plo = partners[0], partners[1]
    p_lt_s = _lt_i(ph, plo, h, l)
    s_lt_p = _lt_i(h, l, ph, plo)
    # take = (is_a == asc) ? p_lt_s : s_lt_p   — pure i32 algebra
    agree = 1 - ((1 - is_b) ^ asc_i)
    take = (agree * p_lt_s + (1 - agree) * s_lt_p) == 1
    return tuple(jnp.where(take, px, x) for px, x in zip(partners, planes))


def _strides_down(planes, r, kk, asc_i, idx):
    """Run bitonic strides 2^(kk-1) .. 1 (``kk`` traced) over one tile:
    first the lane-axis strides (>= r) then the sublane strides (< r),
    each as a fori_loop with traced roll distances."""
    lb_r = r.bit_length() - 1

    def lane_body(i, pls):
        jj = kk - 1 - i
        sh = jnp.int32(1) << (jj - lb_r)
        return _stride_step(pls, 1, sh, jj, asc_i, idx)

    planes = jax.lax.fori_loop(jnp.int32(0), jnp.maximum(kk - lb_r, 0),
                               lane_body, planes)
    start = jnp.minimum(kk - 1, lb_r - 1)

    def sub_body(i, pls):
        jj = start - i
        sh = jnp.int32(1) << jj
        return _stride_step(pls, 0, sh, jj, asc_i, idx)

    return jax.lax.fori_loop(jnp.int32(0), start + 1, sub_body, planes)


def _block_network(planes, r, idx, parity_int):
    """Full bitonic sort network for one [r, 128] tile: stages k = 2..n.

    ``idx``: the tile's logical (column-major) element index tensor.
    ``parity_int`` (i32 scalar, 0 = ascending) is the direction for the
    k == n stage (bit = block index LSB) — folded in as bit log2(n) of a
    per-element global index so every stage reads its direction from the
    same bit test.  Directions are i32 0/1 tensors (1 = asc) — see _lt_i
    for why no vector bools."""
    n = r * LANES
    g_idx = idx + parity_int * n

    def stage(s, pls):
        kk = s + 1  # stage k = 2^kk
        asc_i = 1 - ((g_idx >> kk) & 1)
        return _strides_down(pls, r, kk, asc_i, idx)

    # i32 traced bounds -> while_loop with an i32 counter; a static-bound
    # fori lowers to scan whose i64 counter Mosaic can't convert.
    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n.bit_length() - 1),
                             stage, planes)


def _finish_network(planes, r, asc_i, idx):
    """Within-block finishing strides n/2..1 with a constant direction
    (``asc_i``: i32 0/1 tensor, 1 = ascending; constant-valid for stages
    k >= 2*block where the k-bit is a block-index bit)."""
    n = r * LANES
    return _strides_down(planes, r, jnp.int32(n.bit_length() - 1), asc_i,
                         idx)


def _block_sort_kernel(*refs, n_planes, force_asc=False):
    ins = refs[:n_planes]
    outs = refs[n_planes:]
    planes = tuple(ref[0] for ref in ins)
    r = planes[0].shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    idx = lane * r + row  # column-major logical index
    if force_asc:
        parity_int = jnp.int32(0)  # every block ascending (compaction path)
    else:
        parity_int = pl.program_id(0) & 1  # 0 = ascending block
    planes = _block_network(planes, r, idx, parity_int)
    for o, v in zip(outs, planes):
        o[0] = v


@functools.partial(jax.jit, static_argnums=(1, 2))
def _block_sort(tiles, n_planes: int, force_asc: bool = False):
    """tiles: tuple of [B, R, 128] u32 planes -> each block bitonic-sorted
    (alternately ascending/descending by block parity; all ascending with
    ``force_asc`` — used by compact_pallas where blocks are independent)."""
    B = tiles[0].shape[0]
    r = tiles[0].shape[1]
    spec = pl.BlockSpec((1, r, LANES), lambda b: (b, b * 0, b * 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_sort_kernel, n_planes=n_planes,
                          force_asc=force_asc),
        grid=(B,),
        in_specs=[spec] * n_planes,
        out_specs=tuple([spec] * n_planes),
        out_shape=tuple(
            jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tiles
        ),
        input_output_aliases=_aliases(n_planes),
        compiler_params=None if INTERPRET else _COMPILER_PARAMS,
        interpret=INTERPRET,
    )(*tiles)


def _hbm_step_kernel(*refs, n_planes, kb, jb, finish, asc_override):
    """Cross-block compare-exchange: the tile holds the (low, high) block
    pair at block distance ``jb``; direction from the pair's position in
    its k-run (kb = k in block units).  When ``finish`` is set (jb == 1,
    the last cross-block stride of the stage), the full within-block
    network (strides BLK/2..1) runs here too, saving one HBM round-trip
    per block per stage."""
    ins = refs[:n_planes]
    outs = refs[n_planes:]
    g = pl.program_id(0)
    t = pl.program_id(1)
    b_low = g * (2 * jb) + t
    # direction as an i32 0/1 (1 = ascending): no vector bools, see _lt_i.
    if asc_override:
        asc_scalar = jnp.int32(1)
    else:
        asc_scalar = 1 - jnp.sign(b_low & kb)
    a = [ref[0, 0, 0] for ref in ins]
    b = [ref[0, 1, 0] for ref in ins]
    r = a[0].shape[0]
    asc_i = jnp.zeros(a[0].shape, jnp.int32) + asc_scalar
    b_lt_a = _lt_i(b[0], b[1], a[0], a[1])
    a_lt_b = _lt_i(a[0], a[1], b[0], b[1])
    take = (asc_i * b_lt_a + (1 - asc_i) * a_lt_b) == 1
    new_a = [jnp.where(take, y, x) for x, y in zip(a, b)]
    new_b = [jnp.where(take, x, y) for x, y in zip(a, b)]
    if finish:
        row = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
        idx = lane * r + row  # column-major logical index
        new_a = _finish_network(tuple(new_a), r, asc_i, idx)
        new_b = _finish_network(tuple(new_b), r, asc_i, idx)
    for o, va, vb in zip(outs, new_a, new_b):
        o[0, 0, 0] = va
        o[0, 1, 0] = vb


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _hbm_step(tiles, n_planes: int, kb: int, jb: int, finish: bool,
              asc_override: bool = False):
    """One cross-block stage step over [B, R, 128] planes: blocks pair at
    distance jb; pairs are made contiguous by a free leading-dim reshape
    to [G, 2, jb, R, 128] so ONE strided BlockSpec DMAs both halves."""
    B, r, _ = tiles[0].shape
    G = B // (2 * jb)
    viewed = tuple(t.reshape(G, 2, jb, r, LANES) for t in tiles)
    spec = pl.BlockSpec((1, 2, 1, r, LANES), lambda g, t: (g, g * 0, t, g * 0, g * 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_hbm_step_kernel, n_planes=n_planes, kb=kb,
                          jb=jb, finish=finish, asc_override=asc_override),
        grid=(G, jb),
        in_specs=[spec] * n_planes,
        out_specs=tuple([spec] * n_planes),
        out_shape=tuple(
            jax.ShapeDtypeStruct(t.shape, t.dtype) for t in viewed
        ),
        input_output_aliases=_aliases(n_planes),
        compiler_params=None if INTERPRET else _COMPILER_PARAMS,
        interpret=INTERPRET,
    )(*viewed)
    return tuple(t.reshape(B, r, LANES) for t in out)


def _merge_tree(tiles, n_planes: int, first_level: int = 1,
                asc_override: bool = False):
    """Cross-block bitonic stages for levels first_level..log2(B):
    level ℓ sorts runs of 2^ℓ blocks (strides 2^(ℓ-1)..1 block units,
    the jb==1 step fused with the within-block finish)."""
    B = tiles[0].shape[0]
    levels = B.bit_length() - 1
    for lvl in range(first_level, levels + 1):
        kb = 1 << lvl
        jb = kb >> 1
        while jb >= 1:
            tiles = _hbm_step(tiles, n_planes, kb, jb, finish=(jb == 1),
                              asc_override=asc_override)
            jb >>= 1
    return tiles


# ---------------------------------------------------------------------------
# public entry points (shape plumbing: u64 <-> u32 planes, padding, layout)

def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _to_tiles(x, pad_val, logical: bool = False):
    """u64 [n] -> ((hi, lo) u32 planes [B, R, 128], B).  Pads to a
    power-of-two number of BLK blocks.

    The kernels DEFINE logical element order as column-major within a tile
    (element i at tile[i % R, i // R]).  For unsorted input the initial
    permutation is irrelevant, so the default loads tiles with a free
    row-major reshape.  Pre-sorted input (the merge path) must be loaded
    in TRUE logical order (``logical=True``: reshape + transpose) or the
    runs stop being ascending under the kernel's ordering."""
    n = x.shape[0]
    total = max(BLK, _next_pow2(n))
    if total > n:
        x = jnp.concatenate([x, jnp.full((total - n,), pad_val, x.dtype)])
    B = total // BLK
    hi = (x >> jnp.uint64(32)).astype(jnp.uint32)
    lo = x.astype(jnp.uint32)
    if logical:
        hi = hi.reshape(B, LANES, _r()).transpose(0, 2, 1)
        lo = lo.reshape(B, LANES, _r()).transpose(0, 2, 1)
    else:
        hi = hi.reshape(B, _r(), LANES)
        lo = lo.reshape(B, _r(), LANES)
    return (hi, lo), B


def _payload_tiles(p, total, logical: bool = False):
    n = p.shape[0]
    if total > n:
        p = jnp.concatenate([p, jnp.zeros((total - n,), p.dtype)])
    if logical:
        return p.reshape(total // BLK, LANES, _r()).transpose(0, 2, 1)
    return p.reshape(total // BLK, _r(), LANES)


def _from_tiles(planes, n):
    """Invert _to_tiles: logical column-major tile order -> flat natural.
    sorted_flat[b*BLK + lane*R + row] = tile[b, row, lane]."""
    hi, lo = planes[0], planes[1]
    flat_hi = hi.transpose(0, 2, 1).reshape(-1)
    flat_lo = lo.transpose(0, 2, 1).reshape(-1)
    out = (flat_hi.astype(jnp.uint64) << jnp.uint64(32)) | flat_lo.astype(jnp.uint64)
    return out


# Resolved ONCE at import: the dispatch runs at jit trace time, so a
# mid-process env flip would be silently ignored by the jit cache anyway.
# KMCEX_PALLAS_SORT=0 is a process-start-only escape hatch.
import os as _os

_ENV_DISABLED = _os.environ.get("KMCEX_PALLAS_SORT", "1") == "0"


def use_pallas_sort() -> bool:
    if _ENV_DISABLED:
        return False
    return jax.default_backend() == "tpu"


def sort_u64(x: jnp.ndarray) -> jnp.ndarray:
    """Ascending sort of a uint64 vector.  Returns a PADDED result (next
    power-of-two block count) with SENTINEL (0xFF..F) padding at the tail
    — callers in the counting pipeline treat SENTINEL as masked anyway."""
    (hi, lo), B = _to_tiles(x, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    tiles = _block_sort((hi, lo), 2)
    tiles = _merge_tree(tiles, 2)
    return _from_tiles(tiles, x.shape[0])


def sort_u64_with_payload(x: jnp.ndarray, payload: jnp.ndarray):
    """Ascending sort of (u64 keys, u32 payload).  Padded like sort_u64
    (payload pads with zeros)."""
    (hi, lo), B = _to_tiles(x, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    pt = _payload_tiles(payload, B * BLK)
    tiles = _block_sort((hi, lo, pt), 3)
    tiles = _merge_tree(tiles, 3)
    keys = _from_tiles(tiles[:2], x.shape[0])
    pay = tiles[2].transpose(0, 2, 1).reshape(-1)
    return keys, pay


def merge_sorted_u64(a, ca, b, cb):
    """Merge two ascending (u64 key, u32 payload) runs into one ascending
    padded run: ascending a ++ SENTINEL padding ++ descending (flipped) b
    forms a bitonic sequence, so only the FINAL bitonic stage runs — a
    fraction of a full re-sort.  Works for any run lengths; the result is
    padded to a power-of-two block count with SENTINEL tail entries
    (padding must sit BETWEEN the runs to preserve bitonicity, so it
    surfaces in the middle pre-merge and sorts to the tail)."""
    la, lb = a.shape[0], b.shape[0]
    total = max(BLK, _next_pow2(la + lb))
    pad = total - la - lb
    x = jnp.concatenate([
        a, jnp.full((pad,), SENTINEL64, jnp.uint64), jnp.flip(b)])
    p = jnp.concatenate([
        ca, jnp.zeros((pad,), jnp.uint32), jnp.flip(cb)])
    (hi, lo), B = _to_tiles(x, SENTINEL64, logical=True)
    pt = _payload_tiles(p, B * BLK, logical=True)
    tiles = (hi, lo, pt)
    if B == 1:
        tiles = _bitonic_finish_single(tiles, 3)
    else:
        tiles = _merge_tree(tiles, 3, first_level=B.bit_length() - 1,
                            asc_override=True)
    keys = _from_tiles(tiles[:2], x.shape[0])
    pay = tiles[2].transpose(0, 2, 1).reshape(-1)
    return keys, pay


def _bitonic_finish_kernel(*refs, n_planes):
    ins = refs[:n_planes]
    outs = refs[n_planes:]
    planes = tuple(ref[0] for ref in ins)
    r = planes[0].shape[0]
    asc_i = jnp.ones((r, LANES), jnp.int32)  # ascending everywhere
    row = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    idx = lane * r + row  # column-major logical index
    planes = _finish_network(planes, r, asc_i, idx)
    for o, v in zip(outs, planes):
        o[0] = v


@functools.partial(jax.jit, static_argnums=(1,))
def _bitonic_finish_single(tiles, n_planes: int):
    B, r, _ = tiles[0].shape
    spec = pl.BlockSpec((1, r, LANES), lambda b: (b, b * 0, b * 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bitonic_finish_kernel, n_planes=n_planes),
        grid=(B,),
        in_specs=[spec] * n_planes,
        out_specs=tuple([spec] * n_planes),
        out_shape=tuple(
            jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tiles
        ),
        input_output_aliases=_aliases(n_planes),
        compiler_params=None if INTERPRET else _COMPILER_PARAMS,
        interpret=INTERPRET,
    )(*tiles)
