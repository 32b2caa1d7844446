"""Batched multi-adapter (LoRA/delta) matmul — the triteia ``ldmm`` role
(reference: scratchpad/nn/toppings/topping_layer.py:25 ldmm,
topping_layer.py:42-377 apply over batched adapters).

Two parts, chosen by adapter kind:

- rank-r LoRA: the active adapters' [In,r]/[r,Out] factors are tiny, so
  they are gathered once per layer and applied as ONE pair of batched
  einsums with the slot one-hot (x scaling) folded into the low-rank
  intermediate — no per-slot [T,Out] contributions, no where-merges, and
  the MXU sees two well-shaped contractions instead of 2*(S-1) slivers.

- full-rank int8 deltas: a Pallas kernel per active slot. The weight
  block index map is constant across the row-tile sweep, so each delta
  panel streams HBM->VMEM exactly ONCE per call (the masked-dense path
  materialised a bf16 dequant copy per slot per layer: 5x the traffic),
  dequant (int8 -> f32 via int32, per-out-channel scale) happens on the
  VPU right before the dot, and row tiles with no tokens of that slot
  skip compute entirely (prefill FLOPs scale with the slot's tokens, not
  the whole batch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 16  # bf16 sublane tile


def lora_grouped(
    x: jax.Array,  # [T, In]
    A_act: jax.Array,  # [S-1, In, r] active adapters' A (slot 0 dropped)
    B_act: jax.Array,  # [S-1, r, Out]
    slot_scale: jax.Array,  # f32[T, S-1] one-hot(slot) * alpha/r scaling
) -> jax.Array:
    """sum_s ((x (*) mask_s) @ A_s) @ B_s as two batched contractions."""
    u = jnp.einsum(
        "ti,sir->tsr", x, A_act, preferred_element_type=jnp.float32
    )
    u = (u * slot_scale[:, :, None]).astype(x.dtype)
    return jnp.einsum(
        "tsr,sro->to", u, B_act, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _delta_kernel(idx_ref, tile_any_ref, x_ref, m_ref, dq_ref, ds_ref, o_ref):
    t = pl.program_id(1)

    @pl.when(tile_any_ref[t] > 0)
    def _():
        xm = x_ref[...] * m_ref[...].astype(x_ref.dtype)
        # no direct int8->float cast on TPU: widen via int32
        w = dq_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
        acc = jax.lax.dot(
            xm, w.astype(xm.dtype), preferred_element_type=jnp.float32
        )
        o_ref[...] = (acc * ds_ref[0, 0].astype(jnp.float32)).astype(
            o_ref.dtype
        )

    @pl.when(tile_any_ref[t] == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def delta_matmul(
    x: jax.Array,  # [T, In] activations
    dq: jax.Array,  # i8[N, L, In, Out] delta pool
    ds: jax.Array,  # f32[N, L, Out] per-out-channel scales
    aid: jax.Array,  # i32[] pool slot (0 = zero adapter -> cached no-op)
    layer: jax.Array,  # i32[] layer index
    mask_scale: jax.Array,  # f32[T] slot mask * adapter scaling
    interpret: bool = False,
) -> jax.Array:
    """One adapter's (x * mask) @ dequant(dq[aid, layer]) * ds, f32->x.dtype.

    The weight panel is DMA'd once (block index constant over the row-tile
    sweep); tiles whose mask is all-zero skip the dot.
    """
    T, In = x.shape
    N, L, In2, Out = dq.shape
    assert In == In2
    Tp = -(-T // _TILE_R) * _TILE_R
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        mask_scale = jnp.pad(mask_scale, (0, Tp - T))
    nt = Tp // _TILE_R
    OUT_BLK = Out if Out % 256 else 256
    tile_any = jnp.any(
        mask_scale.reshape(nt, _TILE_R) != 0.0, axis=1
    ).astype(jnp.int32)
    # aid==0 keeps the block index pinned at the zero adapter: consecutive
    # grid steps hit the same (cached) block and compute is skipped
    tile_any = tile_any * (aid > 0).astype(jnp.int32)
    idx = jnp.stack([aid.astype(jnp.int32), layer.astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # idx, tile_any
        grid=(Out // OUT_BLK, nt),
        in_specs=[
            pl.BlockSpec((_TILE_R, In), lambda o, t, idx, ta: (t, 0)),
            pl.BlockSpec((_TILE_R, 1), lambda o, t, idx, ta: (t, 0)),
            pl.BlockSpec(
                (1, 1, In, OUT_BLK),
                lambda o, t, idx, ta: (idx[0], idx[1], 0, o),
            ),
            pl.BlockSpec(
                (1, 1, OUT_BLK), lambda o, t, idx, ta: (idx[0], idx[1], o)
            ),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_R, OUT_BLK), lambda o, t, idx, ta: (t, o)
        ),
    )
    y = pl.pallas_call(
        _delta_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, Out), x.dtype),
        interpret=interpret,
    )(idx, tile_any, x, mask_scale[:, None], dq, ds)
    return y[:T]


def delta_matmul_xla(x, dq, ds, aid, layer, mask_scale):
    """Reference/CPU fallback: dense dequant then masked matmul."""
    dw = dq[aid, layer].astype(jnp.int32).astype(x.dtype)
    s = ds[aid, layer].astype(x.dtype)
    xm = x * mask_scale[:, None].astype(x.dtype)
    return ((xm @ dw) * s).astype(x.dtype)
