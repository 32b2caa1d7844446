"""FP8 (e4m3) weight-only quantization.

BASELINE config 4 ("8B FP8 weights+KV"). Weights are stored as
float8_e4m3fn with one scale per output channel; the matmul upcasts to
bf16 on read (XLA fuses the convert into the dot operand load on TPU) and
applies the channel scale to the f32 accumulator.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

F8 = jnp.float8_e4m3fn
F8_MAX = 448.0


@dataclasses.dataclass
class Fp8Linear:
    w8: jax.Array  # [..., In, Out] float8_e4m3fn
    s: jax.Array  # [..., Out] f32 per-output-channel scale


jax.tree_util.register_dataclass(Fp8Linear, data_fields=["w8", "s"], meta_fields=[])


def quantize_fp8_stacked(w_stacked: Any) -> Fp8Linear:
    """Quantize a layer-stacked weight [L, In, Out] to fp8 + channel scales.

    Expert stacks [L, E, In, Out] flatten (layer, expert) into one leading
    axis; callers index layer*E + e (matches w4a16.quantize_stacked)."""
    w = np.asarray(w_stacked, np.float32)
    if w.ndim == 4:
        w = w.reshape(-1, *w.shape[2:])
    amax = np.abs(w).max(axis=-2, keepdims=True)  # [L, 1, Out]
    scale = np.maximum(amax / F8_MAX, 1e-12)
    w8 = jnp.asarray(w / scale, F8)
    return Fp8Linear(w8=w8, s=jnp.asarray(scale[..., 0, :], np.float32))


def fp8_matmul(x: jax.Array, fl: Fp8Linear, layer_idx) -> jax.Array:
    """x [T, In] @ fp8 W of the given layer."""
    w8 = fl.w8[layer_idx]
    s = fl.s[layer_idx]
    acc = jnp.dot(
        x, w8.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return (acc * s).astype(x.dtype)


def quantize_model_params_fp8(params: dict) -> dict:
    from scratchpad_tpu.ops.quant.w4a16 import QUANT_TARGETS

    layers = dict(params["layers"])
    layers_q = {}
    for t in QUANT_TARGETS:
        if t in layers:
            layers_q[t] = quantize_fp8_stacked(layers.pop(t))
    out = dict(params)
    out["layers"] = layers
    out["layers_q"] = layers_q
    return out


def fp8_param_specs(base_specs: dict, params: dict, tp_axis: str = "tp"):
    from jax.sharding import PartitionSpec as P

    specs = dict(base_specs)
    specs["layers"] = {
        k: v for k, v in base_specs["layers"].items() if k in params["layers"]
    }
    lq = {}
    for name in params["layers_q"]:
        if name in ("wo", "down", "w2"):
            lq[name] = Fp8Linear(w8=P(None, tp_axis, None), s=P(None, None))
        else:
            lq[name] = Fp8Linear(w8=P(None, None, tp_axis), s=P(None, tp_axis))
    specs["layers_q"] = lq
    return specs
