"""W4A16 group-quantized weights (triteia sparse_low_precision_linear
equivalent; reference: scratchpad/nn/layers/linear.py:1166 TritelaLinear).

Packing ("nibble planes"): a weight W[In, Out] is stored as

    q : uint8 [In/2, Out]   low nibble  = rows [0, In/2)
                            high nibble = rows [In/2, In)
    s : f32/bf16 [In/group, Out]  per-(group, out) scales
    z : f32/bf16 [In/group, Out]  per-(group, out) zero points (in quant units)

so dequant is two independent halves with NO row interleaving — the unpack
is a pure elementwise op and the matmul splits into
``x[:, :In/2] @ W_lo + x[:, In/2:] @ W_hi``. Group axis runs along In
(GPTQ/AWQ convention), and In/2 must be a multiple of group_size so each
nibble plane sees whole groups.

Values are unsigned 4-bit: w = (nibble - z) * s.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class QuantizedLinear:
    """Pytree for one (possibly layer-stacked) quantized weight."""

    q: jax.Array  # uint8 [..., In/2, Out]
    s: jax.Array  # [..., In/group, Out]
    z: jax.Array  # [..., In/group, Out]
    group_size: int = 128  # static
    # true output width when Out was padded up to a 128-lane multiple
    # (e.g. GPT-OSS hidden 2880 -> stored 2944); 0 = unpadded
    out_true: int = 0

    @property
    def in_features(self) -> int:
        return self.q.shape[-2] * 2

    @property
    def out_features(self) -> int:
        return self.out_true or self.q.shape[-1]


jax.tree_util.register_dataclass(
    QuantizedLinear,
    data_fields=["q", "s", "z"],
    meta_fields=["group_size", "out_true"],
)


def quantize_w4(
    w: np.ndarray, group_size: int = 128, dtype=jnp.bfloat16
) -> QuantizedLinear:
    """Asymmetric per-group 4-bit quantization of W[In, Out] (host-side)."""
    w = np.asarray(w, np.float32)
    In, Out = w.shape
    assert In % (2 * group_size) == 0 or (In % 2 == 0 and (In // 2) % group_size == 0), (
        f"In={In} not compatible with group={group_size}"
    )
    G = In // group_size
    wg = w.reshape(G, group_size, Out)
    wmin = wg.min(axis=1)  # [G, Out]
    wmax = wg.max(axis=1)
    scale = np.maximum((wmax - wmin) / 15.0, 1e-8)
    zero = np.round(-wmin / scale)  # in quant units, [0, 15]
    q = np.clip(np.round(wg / scale[:, None, :]) + zero[:, None, :], 0, 15)
    q = q.reshape(In, Out).astype(np.uint8)
    lo, hi = q[: In // 2], q[In // 2 :]
    packed = (lo | (hi << 4)).astype(np.uint8)
    return QuantizedLinear(
        q=jnp.asarray(packed),
        s=jnp.asarray(scale, dtype),
        z=jnp.asarray(zero, dtype),
        group_size=group_size,
    )


def _expand_groups(x: jax.Array, group_size: int) -> jax.Array:
    """[G, Out] -> [G*group, Out] by repeating each group row."""
    G, Out = x.shape[-2], x.shape[-1]
    return jnp.repeat(x, group_size, axis=-2)


def dequantize_w4(ql: QuantizedLinear, dtype=jnp.bfloat16) -> jax.Array:
    """Full dequant back to [In, Out] (reference/debug path)."""
    lo = (ql.q & 0xF).astype(jnp.float32)
    hi = (ql.q >> 4).astype(jnp.float32)
    nibbles = jnp.concatenate([lo, hi], axis=-2)  # [In, Out]
    s = _expand_groups(ql.s.astype(jnp.float32), ql.group_size)
    z = _expand_groups(ql.z.astype(jnp.float32), ql.group_size)
    w = ((nibbles - z) * s).astype(dtype)
    return w[..., : ql.out_true] if ql.out_true else w


def quantize_stacked(
    w_stacked: Any, group_size: int = 128, dtype=jnp.bfloat16
) -> QuantizedLinear:
    """Quantize a layer-stacked weight [L, In, Out] (vectorised over layers).

    Expert-stacked weights [L, E, In, Out] flatten the (layer, expert) dims
    to one leading axis — the Pallas kernel's scalar-prefetch index then
    selects layer*E + e (the triteia-sbmm role,
    reference: scratchpad/nn/models/llama/llama_quant_moe.py:29-36)."""
    w = np.asarray(w_stacked)  # keep the source dtype: NO whole-array f32
    if w.ndim == 4:
        w = w.reshape(-1, *w.shape[2:])
    L, In, Out = w.shape
    # largest group <= group_size that divides the nibble-plane height
    # (GPT-OSS hidden 2880 -> half 1440 -> g 120)
    g = min(group_size, In // 2)
    while (In // 2) % g:
        g -= 1
    G = In // g
    # stream one leading slice at a time: a 20B-class expert stack in one
    # f32 expression peaks at >3x the array (~150 GB) and OOMs the host
    packed = np.empty((L, In // 2, Out), np.uint8)
    scale = np.empty((L, G, Out), np.float32)
    zero = np.empty((L, G, Out), np.float32)
    for l in range(L):
        wl = np.asarray(w[l], np.float32).reshape(G, g, Out)
        wmin = wl.min(axis=1)  # [G, Out]
        wmax = wl.max(axis=1)
        sc = np.maximum((wmax - wmin) / 15.0, 1e-8)
        ze = np.round(-wmin / sc)
        q = np.clip(
            np.round(wl / sc[:, None, :]) + ze[:, None, :], 0, 15
        ).astype(np.uint8).reshape(In, Out)
        packed[l] = q[: In // 2] | (q[In // 2 :] << 4)
        scale[l] = sc
        zero[l] = ze
    out_true = 0
    pad = (-Out) % 128
    if pad and Out > 128:
        # lane-pad Out so Pallas output/weight blocks tile (padded columns
        # dequantize to exactly zero; callers slice back to out_features)
        out_true = Out
        packed = np.pad(packed, ((0, 0), (0, 0), (0, pad)))
        scale = np.pad(scale, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
        zero = np.pad(zero, ((0, 0), (0, 0), (0, pad)))
    return QuantizedLinear(
        q=jnp.asarray(packed),
        s=jnp.asarray(scale, dtype),
        z=jnp.asarray(zero, dtype),
        group_size=g,
        out_true=out_true,
    )


QUANT_TARGETS = (
    "wq", "wk", "wv", "wo", "gate", "up", "down",
    # MoE expert stacks [L, E, In, Out] (flattened to L*E on the lead axis;
    # "down" doubles as GPT-OSS's 4-D expert down projection)
    "w1", "w2", "w3", "gate_up",
)


def quantize_model_params(
    params: dict, group_size: int = 128, fuse_gate_up: bool = False
) -> dict:
    """Replace the large decoder weights with 4-bit planes.

    params["layers"][t] -> params["layers_q"][t] for t in QUANT_TARGETS. The
    quantized arrays are NOT scan-sliced (the model captures them and indexes
    by layer id inside the Pallas kernel's prefetched BlockSpec).

    ``fuse_gate_up`` concatenates gate|up along Out into ONE stack
    ("gate_up_f"): the MLP then runs one fused W4 matmul instead of two,
    halving the per-call overhead and the activation quantize/read work
    (VERDICT r3 item 6). Group quantization runs along In, so the fused
    quantization is bit-identical per column to quantizing separately.
    Single-device layouts only — a TP shard of the naive concat would span
    gate-only columns (the shard-aware interleave is future work).
    """
    if not isinstance(params.get("layers"), dict):
        raise ValueError(
            "quantization needs stacked-layer params (dict of [L, ...] "
            "arrays); this model stores per-layer dicts"
        )
    layers = dict(params["layers"])
    layers_q = {}
    if fuse_gate_up and "gate" in layers and "up" in layers:
        g = np.asarray(layers.pop("gate"))
        u = np.asarray(layers.pop("up"))
        layers_q["gate_up_f"] = quantize_stacked(
            np.concatenate([g, u], axis=-1), group_size
        )
        del g, u
    for t in QUANT_TARGETS:
        if t in layers:
            layers_q[t] = quantize_stacked(layers.pop(t), group_size)
    out = dict(params)
    out["layers"] = layers
    out["layers_q"] = layers_q
    return out


def quant_param_specs(base_specs: dict, params: dict, tp_axis: str = "tp"):
    """Mirror a quantized param tree with PartitionSpecs.

    Column-parallel weights (wq/wk/wv/gate/up) shard the Out axis; the
    row-parallel ones (wo/down) shard the In axis, which for the planes is
    the q row axis and the s/z group axis.
    """
    from jax.sharding import PartitionSpec as P

    specs = dict(base_specs)
    specs["layers"] = {
        k: v for k, v in base_specs["layers"].items() if k in params["layers"]
    }
    lq = {}
    for name, ql in params["layers_q"].items():
        if name in ("wo", "down", "w2"):
            spec = P(None, tp_axis, None)
        else:
            spec = P(None, None, tp_axis)
        lq[name] = QuantizedLinear(
            q=spec, s=spec, z=spec,
            group_size=ql.group_size, out_true=ql.out_true,
        )
    specs["layers_q"] = lq
    return specs


def slice_layer(ql: QuantizedLinear, layer_idx) -> QuantizedLinear:
    return QuantizedLinear(
        q=ql.q[layer_idx],
        s=ql.s[layer_idx],
        z=ql.z[layer_idx],
        group_size=ql.group_size,
        out_true=ql.out_true,
    )


def w4a16_matmul_xla(x: jax.Array, ql: QuantizedLinear) -> jax.Array:
    """x[..., In] @ W — XLA path: fused unpack+dequant then two matmuls.

    XLA fuses the elementwise dequant into the matmul read on TPU; the
    Pallas kernel (pallas_w4.py) additionally keeps the packed bytes in
    VMEM to halve HBM traffic.
    """
    half = ql.q.shape[-2]
    dtype = x.dtype
    lo = (ql.q & 0xF).astype(dtype)
    hi = (ql.q >> 4).astype(dtype)
    s = _expand_groups(ql.s, ql.group_size).astype(dtype)
    z = _expand_groups(ql.z, ql.group_size).astype(dtype)
    w_lo = (lo - z[..., :half, :]) * s[..., :half, :]
    w_hi = (hi - z[..., half:, :]) * s[..., half:, :]
    y = x[..., :half] @ w_lo + x[..., half:] @ w_hi
    return y[..., : ql.out_true] if ql.out_true else y


def w4a8_matmul_xla(x: jax.Array, ql: QuantizedLinear) -> jax.Array:
    """W4A8 reference path mirroring the Pallas kernel's exact int math:
    per-token symmetric int8 activations, i32 group dots, group-factored
    scale/zero application. Used on CPU and for parity tests."""
    In = ql.in_features
    half = In // 2
    gs, G = ql.group_size, ql.s.shape[-2]
    lead = x.shape[:-1]
    xf = x.reshape(-1, In).astype(jnp.float32)
    B = xf.shape[0]
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    ax = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    x8 = jnp.clip(jnp.round(xf / ax), -127, 127).astype(jnp.int8)
    # nibble planes back to full [In, Out] int rows
    n = jnp.concatenate(
        [(ql.q & 0xF).astype(jnp.int8), (ql.q >> 4).astype(jnp.int8)],
        axis=-2,
    )
    pg = jax.lax.dot_general(
        x8.reshape(B, G, gs),
        n.reshape(G, gs, -1),
        (((2,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [G, B, Out]
    s = ql.s.astype(jnp.float32)
    z = ql.z.astype(jnp.float32)
    acc = jnp.einsum("gbo,go->bo", pg.astype(jnp.float32), s)
    xg_sum = jnp.sum(x8.astype(jnp.float32).reshape(B, G, gs), axis=2)
    acc = acc + xg_sum @ (-(z * s))
    y = (acc * ax).astype(x.dtype).reshape(*lead, -1)
    return y[..., : ql.out_true] if ql.out_true else y
