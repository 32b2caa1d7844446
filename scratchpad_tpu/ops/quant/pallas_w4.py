"""Pallas fused dequant+matmul for W4A16 on TPU.

The MXU-fused equivalent of triteia's quantized GEMM
(reference: scratchpad/nn/layers/linear.py:24 sparse_low_precision_linear).
Packed nibbles stay packed all the way into VMEM — HBM weight traffic is
In*Out/2 bytes + tiny scales — and dequant (unpack, -zero, *scale) happens
on the VPU right before the MXU dot.

Layer-stacked weights are indexed with a scalar-prefetch layer id in the
BlockSpec index map, so calling this inside the model's layer scan reads the
one layer's block straight from HBM with no dynamic-slice materialisation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scratchpad_tpu.ops.quant.w4a16 import QuantizedLinear


def _w4_kernel(layer_ref, x_ref, q_ref, s_ref, z_ref, o_ref, *, group_size):
    half, out_blk = q_ref.shape[1], q_ref.shape[2]
    x = x_ref[...]
    dtype = x.dtype
    # mosaic has no uint8 shift/cast ops: widen to int32 first, then all
    # bit math and the int32 -> f32 -> target-dtype cast chain are legal
    qi = q_ref[0].astype(jnp.int32)  # [half, OUT_BLK]
    if os.environ.get("SPTPU_W4_DEQ", "v3") == "v3":
        # leaner unpack (the 8B profile showed dequant VPU-bound at ~41%
        # of HBM SOL): the stored bytes are two UNSIGNED nibbles, so
        # qi >> 4 is already < 16 — no second mask — and a single
        # int32 -> dtype convert per plane replaces the i32->f32->bf16
        # chain (~5 VPU ops/byte instead of ~9)
        lo = (qi & 0xF).astype(dtype)
        hi = (qi >> 4).astype(dtype)
    else:
        lo = (qi & 0xF).astype(jnp.float32).astype(dtype)
        hi = ((qi >> 4) & 0xF).astype(jnp.float32).astype(dtype)
    s = s_ref[0].astype(dtype)  # [G, OUT_BLK]
    z = z_ref[0].astype(dtype)

    if os.environ.get("SPTPU_W4_KERNEL", "v2") != "v1":
        # v2 default: benched 11.6k tok/s vs <=9.3k with v1
        # (Llama-3.2-1B W4A16 bs=64 decode on v5e)
        # group-factored dequant: per-element work is unpack+cast ONLY.
        #   y = sum_g (x_g @ n_g) * s_g  -  xg_sum @ (z*s)
        # scales/zeros touch [B, OUT] accumulators, never [In, OUT] weights.
        B = x.shape[0]
        G = s.shape[0]
        Gh = G // 2  # groups per nibble plane (group boundaries never
        # straddle the plane split: half = In/2 is a multiple of group_size)
        acc = jnp.zeros((B, out_blk), jnp.float32)
        for g in range(G):
            plane = lo if g < Gh else hi
            row0 = (g if g < Gh else g - Gh) * group_size
            xg = x[:, g * group_size : (g + 1) * group_size]
            pg = jax.lax.dot(
                xg,
                plane[row0 : row0 + group_size],
                preferred_element_type=jnp.float32,
            )
            acc = acc + pg * s[g][None, :].astype(jnp.float32)
        # zero correction: per-group input sums [B, G] @ (z*s) [G, OUT_BLK]
        xg_sum = jnp.sum(
            x.astype(jnp.float32).reshape(B, G, group_size), axis=2
        )
        zs = (z * s).astype(jnp.float32)
        acc = acc - jax.lax.dot(xg_sum, zs, preferred_element_type=jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)
        return

    # v1: full elementwise dequant then two plane matmuls
    s_rows = jnp.repeat(s, group_size, axis=0)
    z_rows = jnp.repeat(z, group_size, axis=0)
    w_lo = (lo - z_rows[:half]) * s_rows[:half]
    w_hi = (hi - z_rows[half:]) * s_rows[half:]
    acc = jax.lax.dot(
        x[:, :half], w_lo, preferred_element_type=jnp.float32
    ) + jax.lax.dot(x[:, half:], w_hi, preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "out_block"))
def _w4_call(x, q, s, z, layer_idx, *, group_size, out_block):
    B, In = x.shape
    L, half, Out = q.shape
    G = s.shape[1]
    # largest block <= out_block that divides Out (GPT-OSS gate_up is 5760,
    # not a multiple of 512 -> 480)
    OUT_BLK = min(out_block, Out)
    while Out % OUT_BLK:
        OUT_BLK -= 128 if OUT_BLK > 128 else 1
    # block the token dim too: a 4096-token prefill bucket's x (16 MiB bf16)
    # cannot live whole in VMEM. Buckets are powers of two, so ROW_BLK | B.
    ROW_BLK = min(B, 512)

    # fit the ~16 MiB scoped-VMEM limit. Measured from compiler
    # scoped-alloc reports (the 8B qkv proj hit exactly 16.04M):
    #   x block bf16, double-buffered        -> 4 * r * In
    #   packed nibbles u8, double-buffered,
    #   + dequant intermediates (~5 B/elem)  -> 7 * half * o
    #   out block bf16, double-buffered      -> 4 * r * o
    def vmem_cost(r, o):
        return 4 * r * In + 7 * (half * o) + 4 * r * o

    BUDGET = 14 * 2**20
    while vmem_cost(ROW_BLK, OUT_BLK) > BUDGET and OUT_BLK > 128:
        OUT_BLK //= 2
    while vmem_cost(ROW_BLK, OUT_BLK) > BUDGET and ROW_BLK > 64:
        ROW_BLK //= 2
    assert B % ROW_BLK == 0 and Out % OUT_BLK == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # out-dim innermost: x's row block stays resident across the sweep
        grid=(B // ROW_BLK, Out // OUT_BLK),
        in_specs=[
            pl.BlockSpec((ROW_BLK, In), lambda r, o, l: (r, 0)),
            pl.BlockSpec((1, half, OUT_BLK), lambda r, o, l: (l[0], 0, o)),
            pl.BlockSpec((1, G, OUT_BLK), lambda r, o, l: (l[0], 0, o)),
            pl.BlockSpec((1, G, OUT_BLK), lambda r, o, l: (l[0], 0, o)),
        ],
        out_specs=pl.BlockSpec((ROW_BLK, OUT_BLK), lambda r, o, l: (r, o)),
    )
    return pl.pallas_call(
        functools.partial(_w4_kernel, group_size=group_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Out), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(jnp.atleast_1d(layer_idx).astype(jnp.int32), x, q, s, z)


def _w4a8_kernel(
    layer_ref, x8_ref, ax_ref, gsum_ref, q_ref, s_ref, z_ref, o_ref, *, group_size
):
    """W4A8: per-token int8 activations on the s8 MXU path.

    The 8B r3 profile showed the bf16 group dots + dequant at ~41% of the
    weight-read SOL; int8 activations halve the MXU tile time (v5e s8 rate
    is 2x bf16) and keep the group-factored dequant OUT of the weight loop:
        y = ax * [ sum_g (x8_g @ n_g)_i32 * s_g  +  x8sum_g @ (-z_g*s_g) ]
    Per-element VPU work stays unpack-only (widen, mask/shift, i32->i8).
    On-chip microbench (bs32, 4096x14336): 193 -> 138-155 us/call vs the
    v2 bf16 kernel (1.25-1.4x). Reference analogue: triteia's quantized
    GEMM (scratchpad/nn/layers/linear.py:24) — CUDA there, Pallas here.
    """
    half, out_blk = q_ref.shape[1], q_ref.shape[2]
    x8 = x8_ref[...]  # [B, In] int8
    B = x8.shape[0]
    G = s_ref.shape[1]
    Gh = G // 2
    qi = q_ref[0].astype(jnp.int32)
    lo = (qi & 0xF).astype(jnp.int8)  # unsigned nibbles 0..15 fit s8
    hi = (qi >> 4).astype(jnp.int8)
    acc = jnp.zeros((B, out_blk), jnp.float32)
    for g in range(G):
        plane = lo if g < Gh else hi
        row0 = (g if g < Gh else g - Gh) * group_size
        xg = x8[:, g * group_size : (g + 1) * group_size]
        pg = jax.lax.dot(
            xg,
            plane[row0 : row0 + group_size],
            preferred_element_type=jnp.int32,
        )
        acc = acc + pg.astype(jnp.float32) * s_ref[0][g][None, :].astype(
            jnp.float32
        )
    # zero correction: per-group int8 input sums @ (-z*s). The sums come in
    # precomputed ([B, G], XLA-fused): summing in-kernel materialised a
    # [ROW_BLK, In] f32 intermediate per out-block (VMEM OOM at the
    # 4096-token prefill bucket) and redid the work for every o block.
    xg_sum = gsum_ref[...]
    zs = -(z_ref[0].astype(jnp.float32) * s_ref[0].astype(jnp.float32))
    acc = acc + jax.lax.dot(xg_sum, zs, preferred_element_type=jnp.float32)
    o_ref[...] = (acc * ax_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "out_block"))
def _w4a8_call(x, q, s, z, layer_idx, *, group_size, out_block):
    B, In = x.shape
    L, half, Out = q.shape
    G = s.shape[1]
    OUT_BLK = min(out_block, Out)
    while Out % OUT_BLK:
        OUT_BLK -= 128 if OUT_BLK > 128 else 1
    ROW_BLK = min(B, 512)

    # int8 x halves the activation block; i32 widen + two i8 planes keep
    # the same ~7 B/elem dequant-intermediate footprint as the bf16 kernel,
    # plus per-group pg/acc f32 accumulators on the out block, plus the
    # double-buffered ax ([r, 1] f32) and gsum ([r, G] f32) input blocks
    # (ADVICE r3: these were unaccounted — ~0.5 MiB at r=512, G=112)
    def vmem_cost(r, o):
        return 2 * r * In + 7 * (half * o) + 12 * r * o + 8 * r * G + 8 * r

    BUDGET = 14 * 2**20
    while vmem_cost(ROW_BLK, OUT_BLK) > BUDGET and OUT_BLK > 128:
        OUT_BLK //= 2
    while vmem_cost(ROW_BLK, OUT_BLK) > BUDGET and ROW_BLK > 64:
        ROW_BLK //= 2
    assert B % ROW_BLK == 0 and Out % OUT_BLK == 0

    # per-token dynamic symmetric int8 quantization (fused into the step by
    # XLA; padding rows are all-zero -> guard the 0 amax)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    ax = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    x8 = jnp.clip(
        jnp.round(x.astype(jnp.float32) / ax), -127, 127
    ).astype(jnp.int8)
    # per-group input sums for the zero correction, precomputed once
    gsum = jnp.sum(
        x8.reshape(B, G, group_size).astype(jnp.int32), axis=2
    ).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // ROW_BLK, Out // OUT_BLK),
        in_specs=[
            pl.BlockSpec((ROW_BLK, In), lambda r, o, l: (r, 0)),
            pl.BlockSpec((ROW_BLK, 1), lambda r, o, l: (r, 0)),
            pl.BlockSpec((ROW_BLK, G), lambda r, o, l: (r, 0)),
            pl.BlockSpec((1, half, OUT_BLK), lambda r, o, l: (l[0], 0, o)),
            pl.BlockSpec((1, G, OUT_BLK), lambda r, o, l: (l[0], 0, o)),
            pl.BlockSpec((1, G, OUT_BLK), lambda r, o, l: (l[0], 0, o)),
        ],
        out_specs=pl.BlockSpec((ROW_BLK, OUT_BLK), lambda r, o, l: (r, o)),
    )
    return pl.pallas_call(
        functools.partial(_w4a8_kernel, group_size=group_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Out), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(jnp.atleast_1d(layer_idx).astype(jnp.int32), x8, ax, gsum, q, s, z)


def w4a8_matmul_pallas(
    x: jax.Array, ql: QuantizedLinear, layer_idx, out_block: int = None
) -> jax.Array:
    """W4A8 variant of :func:`w4a16_matmul_pallas` — same QuantizedLinear
    storage (checkpoint-compatible with w4a16/awq/gptq), int8 activations."""
    if out_block is None:
        out_block = int(os.environ.get("SPTPU_W4_OUT_BLOCK", "1024"))
    y = _w4a8_call(
        x, ql.q, ql.s, ql.z, layer_idx,
        group_size=ql.group_size, out_block=out_block,
    )
    if ql.out_true:
        y = y[..., : ql.out_true]
    return y


def w4a16_matmul_pallas(
    x: jax.Array, ql: QuantizedLinear, layer_idx, out_block: int = None
) -> jax.Array:
    """x [B, In] @ stacked quantized W[L][In, Out], selecting layer_idx.

    For expert stacks quantized as [L*E, In, Out] pass layer*E + e."""
    if out_block is None:
        # v5e sweep (8B W4A16+int8KV bs32): 256 -> 2,169 tok/s, 512 ->
        # 2,286, 1024 -> 2,331 (bigger blocks amortise the per-block
        # prologue; VMEM guard below still clamps when a shape won't fit)
        out_block = int(os.environ.get("SPTPU_W4_OUT_BLOCK", "1024"))
    y = _w4_call(
        x,
        ql.q,
        ql.s,
        ql.z,
        layer_idx,
        group_size=ql.group_size,
        out_block=out_block,
    )
    if ql.out_true:
        y = y[..., : ql.out_true]
    return y


# ---------------------------------------------------------------------------
# 4-bit-native storage: Mosaic accepts uint4/int4 kernel inputs with DIRECT
# casts (u4 -> i8 and s4 -> bf16 both compile; sub-32-bit SHIFTS and
# in-kernel bitwidth-changing BITCASTS do not), so storing the full-height
# nibble tensor as a 4-bit array replaces the whole unpack chain
# (u8 -> i32 widen -> mask/shift -> narrow; the r3 profile's ~41%-of-SOL
# VPU cost) with ONE hardware cast. Same HBM bytes (0.5 B/elem).
#
# STATUS (r5): the jit BOUNDARY is now uint8 — nibble pairs packed along
# adjacent In rows — and the s4 view is created INSIDE the kernel with
# pltpu.bitcast(u8, int4), which Mosaic compiles as a sublane split: byte
# row r becomes s4 rows (2r, 2r+1) with the LOW nibble first (AOT-probed
# + interpret-verified, r5). This removes the r4 blocker entirely: no
# 4-bit arrays ever cross a jit boundary, so the axon relay's device_put
# wrapper (which recursed on S4 transfers, r4 session B) never sees one.
# An XLA-level bitcast_convert_type at the jit top was rejected: it
# materializes a full s4 relayout copy per call (HLO-inspected).
# ---------------------------------------------------------------------------


import dataclasses as _dc


@_dc.dataclass
class Quantized4bit:
    """Layer-stacked 4-bit-native planes. ``q4`` holds the UNSIGNED nibble
    values 0..15 stored as int4 via a -8 shift (int4 because u4 -> bf16 is
    not a legal Mosaic cast while s4 -> bf16 and s4 -> i8 both are); the
    shift is folded into ``z`` (z4 = z - 8) so dequant math is unchanged:
    w = (q4 - z4) * s."""

    # uint8 [L, In/2, Out]: byte (r, c) packs the s4 bit patterns of
    # w[2r, c] (LOW nibble) and w[2r+1, c] (high nibble), pattern =
    # nibble ^ 8 (= two's-complement bits of nibble - 8) — exactly the
    # order pltpu.bitcast(u8, int4) expands to inside the kernel
    q4: jax.Array
    s: jax.Array  # [L, G, Out]
    z: jax.Array  # [L, G, Out]  (already shifted by -8)
    group_size: int = 128
    out_true: int = 0


jax.tree_util.register_dataclass(
    Quantized4bit,
    data_fields=["q4", "s", "z"],
    meta_fields=["group_size", "out_true"],
)


def to_4bit(ql: QuantizedLinear) -> Quantized4bit:
    """Repack the half-height nibble planes (lo = rows [0, In/2), hi =
    rows [In/2, In)) into ADJACENT-ROW byte pairs: byte (r, c) carries the
    s4 patterns of w[2r, c] / w[2r+1, c]. Stays uint8 end to end — no
    4-bit array ever crosses a jit boundary (the axon relay device_put
    landmine, see the STATUS note above).

    The repack runs HOST-SIDE in numpy (one d2h fetch of the u8 planes,
    one h2d push of the result): the earlier per-layer jitted conversion
    buffered whole i32 intermediates in the relay client and got the 8B
    load OOM-KILLED by the host kernel (r5; exit 137, ~60 GB transient
    across the six weight stacks)."""
    import numpy as np

    q = np.asarray(ql.q)  # [L, In/2, Out] u8
    lo = (q & 0xF) ^ 8  # s4 bit patterns of nibble - 8
    hi = (q >> 4) ^ 8
    del q
    full = np.concatenate([lo, hi], axis=1)  # [L, In, Out] row order
    del lo, hi
    q4 = jnp.asarray(full[:, 0::2] | (full[:, 1::2] << 4))
    del full
    return Quantized4bit(
        q4=q4,
        s=ql.s,
        z=ql.z.astype(jnp.float32) - 8.0,
        group_size=ql.group_size,
        out_true=ql.out_true,
    )


def _w4a8_kernel_q4(
    layer_ref, x8_ref, ax_ref, gsum_ref, q_ref, s_ref, z_ref, o_ref, *,
    group_size,
):
    """W4A8 over 4-bit-native storage: ONE s4 -> i8 cast replaces the
    u8 unpack chain; group dots and the factored zero correction are
    identical to _w4a8_kernel (z here is already nibble-shifted)."""
    x8 = x8_ref[...]  # [B, In] int8
    B = x8.shape[0]
    G = s_ref.shape[1]
    # [In/2, OUT_BLK] u8 -> [In, OUT_BLK] s4 (sublane split, low nibble
    # first) -> i8: the entire "unpack" is one bitcast + one cast
    qi = pltpu.bitcast(q_ref[0], jnp.int4).astype(jnp.int8)
    out_blk = qi.shape[-1]
    acc = jnp.zeros((B, out_blk), jnp.float32)
    for g in range(G):
        xg = x8[:, g * group_size : (g + 1) * group_size]
        pg = jax.lax.dot(
            xg,
            qi[g * group_size : (g + 1) * group_size],
            preferred_element_type=jnp.int32,
        )
        acc = acc + pg.astype(jnp.float32) * s_ref[0][g][None, :].astype(
            jnp.float32
        )
    xg_sum = gsum_ref[...]
    zs = -(z_ref[0].astype(jnp.float32) * s_ref[0].astype(jnp.float32))
    acc = acc + jax.lax.dot(xg_sum, zs, preferred_element_type=jnp.float32)
    o_ref[...] = (acc * ax_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _w4_kernel_q4(layer_ref, x_ref, q_ref, s_ref, z_ref, o_ref, *, group_size):
    """W4A16 over 4-bit-native storage: s4 -> bf16 hardware cast, then the
    group-factored v2 math (zero correction uses the shifted z)."""
    x = x_ref[...]
    dtype = x.dtype
    B = x.shape[0]
    G = s_ref.shape[1]
    # [In/2, OUT_BLK] u8 -> [In, OUT_BLK] s4 -> compute dtype: the entire
    # dequant unpack is one bitcast + one hardware cast
    w = pltpu.bitcast(q_ref[0], jnp.int4).astype(dtype)
    out_blk = w.shape[-1]
    acc = jnp.zeros((B, out_blk), jnp.float32)
    for g in range(G):
        xg = x[:, g * group_size : (g + 1) * group_size]
        pg = jax.lax.dot(
            xg,
            w[g * group_size : (g + 1) * group_size],
            preferred_element_type=jnp.float32,
        )
        acc = acc + pg * s_ref[0][g][None, :].astype(jnp.float32)
    xg_sum = jnp.sum(x.astype(jnp.float32).reshape(B, G, group_size), axis=2)
    zs = (z_ref[0].astype(jnp.float32) * s_ref[0].astype(jnp.float32))
    acc = acc - jax.lax.dot(xg_sum, zs, preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "out_block", "a8"))
def _w4_q4_call(x, q4, s, z, layer_idx, *, group_size, out_block, a8):
    B, In = x.shape
    L, _, Out = q4.shape
    G = s.shape[1]
    OUT_BLK = min(out_block, Out)
    while Out % OUT_BLK:
        OUT_BLK -= 128 if OUT_BLK > 128 else 1
    ROW_BLK = min(B, 512)

    # q4 block 0.5 B/elem double-buffered + the cast intermediate
    # (i8: 1 B/elem, bf16: 2 B/elem) + accumulators on the out block
    cast_b = 1 if a8 else 2
    xb = 2 if a8 else 4  # x block bytes/elem (i8 vs bf16), double-buffered

    def vmem_cost(r, o):
        return (
            xb * r * In
            + (1 + cast_b) * In * o
            + 12 * r * o
            + 8 * r * G
            + 8 * r
        )

    BUDGET = 14 * 2**20
    while vmem_cost(ROW_BLK, OUT_BLK) > BUDGET and OUT_BLK > 128:
        OUT_BLK //= 2
    while vmem_cost(ROW_BLK, OUT_BLK) > BUDGET and ROW_BLK > 64:
        ROW_BLK //= 2
    assert B % ROW_BLK == 0 and Out % OUT_BLK == 0

    operands = [jnp.atleast_1d(layer_idx).astype(jnp.int32)]
    if a8:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
        ax = jnp.where(amax == 0.0, 1.0, amax / 127.0)
        x8 = jnp.clip(
            jnp.round(x.astype(jnp.float32) / ax), -127, 127
        ).astype(jnp.int8)
        gsum = jnp.sum(
            x8.reshape(B, G, group_size).astype(jnp.int32), axis=2
        ).astype(jnp.float32)
        operands += [x8, ax, gsum]
        in_specs = [
            pl.BlockSpec((ROW_BLK, In), lambda r, o, l: (r, 0)),
            pl.BlockSpec((ROW_BLK, 1), lambda r, o, l: (r, 0)),
            pl.BlockSpec((ROW_BLK, G), lambda r, o, l: (r, 0)),
        ]
        kernel = functools.partial(_w4a8_kernel_q4, group_size=group_size)
    else:
        operands += [x]
        in_specs = [pl.BlockSpec((ROW_BLK, In), lambda r, o, l: (r, 0))]
        kernel = functools.partial(_w4_kernel_q4, group_size=group_size)
    operands += [q4, s, z]
    in_specs += [
        pl.BlockSpec((1, In // 2, OUT_BLK), lambda r, o, l: (l[0], 0, o)),
        pl.BlockSpec((1, G, OUT_BLK), lambda r, o, l: (l[0], 0, o)),
        pl.BlockSpec((1, G, OUT_BLK), lambda r, o, l: (l[0], 0, o)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // ROW_BLK, Out // OUT_BLK),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ROW_BLK, OUT_BLK), lambda r, o, l: (r, o)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Out), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(*operands)


def w4_matmul_4bit(
    x: jax.Array, ql: Quantized4bit, layer_idx, a8: bool,
    out_block: int = None,
) -> jax.Array:
    if out_block is None:
        out_block = int(os.environ.get("SPTPU_W4_OUT_BLOCK", "1024"))
    y = _w4_q4_call(
        x, ql.q4, ql.s, ql.z, layer_idx,
        group_size=ql.group_size, out_block=out_block, a8=a8,
    )
    if ql.out_true:
        y = y[..., : ql.out_true]
    return y
