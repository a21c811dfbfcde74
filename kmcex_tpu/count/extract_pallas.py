"""Pallas TPU kernel for the k-mer window extraction ladder (alternative
implementation of count/extract, bit-identical, kept non-default).

The kernel runs the whole extract in VMEM per row block: unpack, k-step
sliding-window ladder via lane rotates, (hi, lo) uint32-pair k-mer build
(TPU has no native 64-bit lanes), reverse complement, canonical min, and
sentinel masking — one HBM read of the byte codes, one write of the output
words.

Measured reality on v5e (and the reason this is NOT the default path): the
op is bound by the k lane-rotates, not HBM traffic — `tpu.dynamic_rotate`
costs roughly one relayout of the block per step, and XLA's own unfused
ladder pays the same shuffle cost per slice, so the fused kernel lands
within ~25% of the XLA formulation (4.2ms vs 3.3ms per 65536x152 batch)
rather than the ~10x a traffic-only model predicts.  Sliding windows over
the lane axis have no cheap TPU formulation; the kernel is kept as the
measured evidence and as the scaffold for a word-packed variant (rotate
count O(log k) instead of O(k)).

Mosaic gotchas encoded here: `tpu.dynamic_rotate` rotates over PHYSICAL
lanes, so the lane dim must be padded to the 128-lane width before the
kernel; shift operands must be i32 (x64 mode traces Python ints as i64);
module-level jnp scalars become captured consts.

Semantics are identical to extract.extract_canonical (asserted in
tests/test_extract_pallas.py — interpret mode on the CPU mesh — and
verified on the real chip).

Cites: window walk kmc_file.cpp:991-1133, canonical min tools.hpp:146-167.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL32 = 0xFFFFFFFF  # plain int: jnp scalars would be captured consts in the kernel

ROW_TILE = 256  # rows per grid step; multiple of the int8 sublane tile (32)


def _rev32_2bit(v: jnp.ndarray) -> jnp.ndarray:
    """Reverse a uint32 in 2-bit groups (16 bases)."""
    v = ((v >> jnp.uint32(2)) & jnp.uint32(0x33333333)) | (
        (v & jnp.uint32(0x33333333)) << jnp.uint32(2))
    v = ((v >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F)) | (
        (v & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4))
    v = ((v >> jnp.uint32(8)) & jnp.uint32(0x00FF00FF)) | (
        (v & jnp.uint32(0x00FF00FF)) << jnp.uint32(8))
    return (v >> jnp.uint32(16)) | (v << jnp.uint32(16))


def _kernel(codes_ref, valid_ref, hi_ref, lo_ref, *, k: int, W: int):
    c = codes_ref[:].astype(jnp.uint32)   # [R, L], 0..3 (0 where invalid)
    v = valid_ref[:].astype(jnp.uint32)   # [R, L], 0/1
    R, L = c.shape

    hi = jnp.zeros((R, L), jnp.uint32)
    lo = jnp.zeros((R, L), jnp.uint32)
    vcnt = jnp.zeros((R, L), jnp.uint32)
    for t in range(k):  # static ladder, fully in VMEM
        # left-roll by t expressed as a right-roll by L-t (pltpu.roll
        # requires non-negative shifts): ct[:, w] = c[:, (w+t) % L]
        shift = np.int32((L - t) % L)  # i32: x64 mode would make it an i64
        ct = pltpu.roll(c, shift, axis=1)
        vcnt = vcnt + pltpu.roll(v, shift, axis=1)
        pos = 2 * (k - 1 - t)  # MSB-first 2-bit field; never straddles 32
        if pos >= 32:
            hi = hi | (ct << jnp.uint32(pos - 32))
        else:
            lo = lo | (ct << jnp.uint32(pos))

    # reverse complement of the 2k-bit value held in (hi, lo):
    # bitwise NOT complements each base; 2-bit reversal of the full 64 bits
    # then >> (64-2k) drops the NOT-garbage above bit 2k.
    a = _rev32_2bit(~lo)  # becomes the high word of the reversed 64
    b = _rev32_2bit(~hi)
    s = 64 - 2 * k
    if s == 0:
        rhi, rlo = a, b
    elif s < 32:
        rhi = a >> jnp.uint32(s)
        rlo = (b >> jnp.uint32(s)) | (a << jnp.uint32(32 - s))
    else:
        rhi = jnp.zeros_like(a)
        rlo = a >> jnp.uint32(s - 32)

    take_r = (rhi < hi) | ((rhi == hi) & (rlo < lo))
    chi = jnp.where(take_r, rhi, hi)
    clo = jnp.where(take_r, rlo, lo)

    lane = jax.lax.broadcasted_iota(jnp.uint32, (R, L), 1)
    ok = (vcnt == jnp.uint32(k)) & (lane < jnp.uint32(W))
    sent = jnp.uint32(SENTINEL32)
    hi_ref[:] = jnp.where(ok, chi, sent)
    lo_ref[:] = jnp.where(ok, clo, sent)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _ladder(codes: jnp.ndarray, valid: jnp.ndarray, k: int, interpret: bool):
    B, L = codes.shape
    W = L - k + 1
    # Pad the lane dim to the 128-lane vector width: tpu.dynamic_rotate
    # rotates over PHYSICAL lanes, so the logical length must equal the
    # padded one or rolls drag padding into live columns.
    Lp = -(-L // 128) * 128
    if Lp != L:
        codes = jnp.pad(codes, ((0, 0), (0, Lp - L)))
        valid = jnp.pad(valid, ((0, 0), (0, Lp - L)))
        L = Lp
    grid = B // ROW_TILE
    hi, lo = pl.pallas_call(
        functools.partial(_kernel, k=k, W=W),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, L), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, L), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROW_TILE, L), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, L), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L), jnp.uint32),
            jax.ShapeDtypeStruct((B, L), jnp.uint32),
        ),
        interpret=interpret,
    )(codes, valid)
    kmers = (hi[:, :W].astype(jnp.uint64) << jnp.uint64(32)) | lo[:, :W].astype(
        jnp.uint64
    )
    # validity from the FULL 64-bit sentinel: for k=32 the valid canonical
    # k-mer T^16 A^16 has hi == 0xFFFFFFFF with lo == 0 (ADVICE r1)
    n_valid = jnp.sum(
        (hi[:, :W] != jnp.uint32(SENTINEL32)) | (lo[:, :W] != jnp.uint32(SENTINEL32)),
        dtype=jnp.int64,
    )
    return kmers.reshape(-1), n_valid


def supported(codes_shape: tuple[int, int], k: int) -> bool:
    B, L = codes_shape
    return B % ROW_TILE == 0 and L - k + 1 > 0 and k <= 32


@functools.partial(jax.jit, static_argnums=(2,))
def extract_canonical_packed_fused(packed: jnp.ndarray, maskbits: jnp.ndarray, k: int):
    """Drop-in for extract.extract_canonical_packed on TPU: XLA unpacks the
    2-bit transfer format (one cheap elementwise pass), the Pallas kernel
    runs the ladder + canonicalization fused in VMEM."""
    B, P4 = packed.shape
    shifts = jnp.array([0, 2, 4, 6], dtype=jnp.uint8)
    codes = ((packed[:, :, None] >> shifts[None, None, :]) & 3).reshape(B, P4 * 4)
    mshifts = jnp.arange(8, dtype=jnp.uint8)
    vbits = ((maskbits[:, :, None] >> mshifts[None, None, :]) & 1).reshape(B, -1)
    interpret = jax.devices()[0].platform != "tpu"
    return _ladder(codes, vbits, k, interpret)


@functools.partial(jax.jit, static_argnums=(1,))
def extract_canonical_fused(codes: jnp.ndarray, k: int):
    """Drop-in for extract.extract_canonical (uint8 codes input)."""
    invalid = codes > 3
    interpret = jax.devices()[0].platform != "tpu"
    return _ladder(
        jnp.where(invalid, 0, codes).astype(jnp.uint8),
        (~invalid).astype(jnp.uint8),
        k,
        interpret,
    )
