"""Import pre-quantized HF checkpoints (AutoAWQ / AutoGPTQ int4) directly
into this engine's nibble-plane ``QuantizedLinear`` format — no dequantize/
requantize round trip, so imported weights are bit-exact with the source.

Analogue of the reference's vLLM-derived AWQ/GPTQ weight loaders
(reference: scratchpad/nn/layers/quantization/__init__.py and
scratchpad/model_executor/model_loader.py:94-466). Conventions implemented
from the public on-disk formats:

- **AWQ** (``quant_method: "awq"``): per-linear tensors
  ``qweight`` int32 [In, Out/8] (eight 4-bit values per int32 along the
  OUT dim, nibble order [0,2,4,6,1,3,5,7]), ``qzeros`` int32 [In/g, Out/8]
  (same packing), ``scales`` [In/g, Out]. Dequant: ``w = (q - z) * s``.
- **GPTQ** (``quant_method: "gptq"``): ``qweight`` int32 [In/8, Out]
  (packed along the IN dim, sequential nibble order), ``qzeros`` int32
  [In/g, Out/8] storing ``z - 1`` (the v1 format bakes a +1 offset;
  ``checkpoint_format: "gptq_v2"`` stores ``z`` directly), ``scales``
  [In/g, Out]. Dequant: ``w = (q - z) * s``.

Act-order (``desc_act=True`` with a non-trivial ``g_idx``) permutes rows
across groups and is rejected with a clear error — supporting it would
require permuting activations at runtime.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp

from scratchpad_tpu.ops.quant.w4a16 import QUANT_TARGETS, QuantizedLinear

# AWQ interleaves nibbles so a 128-bit lane holds 8 consecutive logical
# columns in this order; inverse permutation restores logical order.
_AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])
_AWQ_INV = np.argsort(_AWQ_ORDER)

_SHIFTS = (np.arange(8, dtype=np.uint32) * 4)[None, None, :]


def _unpack_int32_nibbles(packed: np.ndarray) -> np.ndarray:
    """int32 [R, C] -> uint8 [R, C, 8] (nibble k = bits 4k..4k+3)."""
    u = packed.astype(np.uint32)[..., None]
    return ((u >> _SHIFTS) & 0xF).astype(np.uint8)


def unpack_awq(qweight, qzeros, scales):
    """AWQ tensors -> (q u8 [In, Out], z f32 [G, Out], s f32 [G, Out])."""
    q = _unpack_int32_nibbles(qweight)[..., _AWQ_INV]  # [In, Out/8, 8]
    q = q.reshape(qweight.shape[0], -1)
    z = _unpack_int32_nibbles(qzeros)[..., _AWQ_INV]
    z = z.reshape(qzeros.shape[0], -1).astype(np.float32)
    return q, z, np.asarray(scales, np.float32)


def unpack_gptq(qweight, qzeros, scales, *, v2: bool = False, g_idx=None):
    """GPTQ tensors -> (q u8 [In, Out], z f32 [G, Out], s f32 [G, Out])."""
    if g_idx is not None:
        g = np.asarray(g_idx)
        expected = np.arange(len(g)) // (len(g) // scales.shape[0])
        if not np.array_equal(g, expected):
            raise NotImplementedError(
                "GPTQ act-order (desc_act=True) checkpoints are not "
                "supported: rows are permuted across quant groups"
            )
    # qweight packs the IN dim: int32 row r holds logical rows 8r..8r+7
    q = _unpack_int32_nibbles(qweight)  # [In/8, Out, 8]
    q = q.transpose(0, 2, 1).reshape(-1, qweight.shape[1])  # [In, Out]
    z = _unpack_int32_nibbles(qzeros).reshape(qzeros.shape[0], -1)
    z = z.astype(np.float32) + (0.0 if v2 else 1.0)
    return q, z, np.asarray(scales, np.float32)


def pack_awq(q: np.ndarray, z: np.ndarray, s: np.ndarray):
    """Inverse of :func:`unpack_awq` (used by round-trip tests)."""

    def pack_cols(vals):  # u8 [R, C] -> int32 [R, C/8]
        v = vals.reshape(vals.shape[0], -1, 8)[..., _AWQ_ORDER].astype(np.uint32)
        return (v << _SHIFTS).sum(axis=-1).astype(np.int32)

    return pack_cols(q), pack_cols(z.astype(np.uint8)), s


def pack_gptq(q: np.ndarray, z: np.ndarray, s: np.ndarray, *, v2: bool = False):
    """Inverse of :func:`unpack_gptq` (used by round-trip tests)."""
    In, Out = q.shape
    qw = q.reshape(In // 8, 8, Out).transpose(0, 2, 1).astype(np.uint32)
    qw = (qw << _SHIFTS).sum(axis=-1).astype(np.int32)
    zi = z.astype(np.int64) - (0 if v2 else 1)
    zv = zi.reshape(z.shape[0], -1, 8).astype(np.uint32)
    qz = (zv << _SHIFTS).sum(axis=-1).astype(np.int32)
    return qw, qz, s


def _to_plane_format(
    qs: list[np.ndarray], zs: list[np.ndarray], ss: list[np.ndarray], dtype
) -> QuantizedLinear:
    """Stack per-layer (q, z, s) and repack into the nibble-plane layout the
    Pallas kernel consumes: rows [0, In/2) in low nibbles, [In/2, In) high."""
    q = np.stack(qs)  # [L, In, Out] u8
    L, In, Out = q.shape
    packed = (q[:, : In // 2] | (q[:, In // 2 :] << 4)).astype(np.uint8)
    s = np.stack(ss)  # [L, G, Out]
    z = np.stack(zs)
    group_size = In // s.shape[1]
    if (In // 2) % group_size:
        raise ValueError(
            f"group_size {group_size} must divide In/2 = {In // 2} "
            "(nibble planes split the IN dim in half)"
        )
    return QuantizedLinear(
        q=jnp.asarray(packed),
        s=jnp.asarray(s, dtype),
        z=jnp.asarray(z, dtype),
        group_size=group_size,
    )


# suffix of the HF module path -> our stacked-layer target name
_HF_QUANT_MAP = {
    "self_attn.q_proj": "wq",
    "self_attn.k_proj": "wk",
    "self_attn.v_proj": "wv",
    "self_attn.o_proj": "wo",
    "mlp.gate_proj": "gate",
    "mlp.up_proj": "up",
    "mlp.down_proj": "down",
}
_QUANT_SUFFIXES = ("qweight", "qzeros", "scales", "g_idx", "qweight_scale")


def split_quant_tensors(state: dict[str, Any]):
    """Partition a flat HF state dict into (plain, quant) tensor dicts."""
    plain, quant = {}, {}
    for name, w in state.items():
        if name.rsplit(".", 1)[-1] in _QUANT_SUFFIXES:
            quant[name] = w
        else:
            plain[name] = w
    return plain, quant


def convert_quantized_layers(
    quant: dict[str, Any],
    num_layers: int,
    method: str,
    dtype=jnp.bfloat16,
    *,
    gptq_v2: bool = False,
) -> dict[str, QuantizedLinear]:
    """Build ``layers_q`` (our stacked QuantizedLinear per target) from the
    quantized tensors of an AutoAWQ / AutoGPTQ checkpoint."""
    assert method in ("awq", "gptq"), method
    per_target: dict[str, dict[int, tuple]] = {t: {} for t in QUANT_TARGETS}
    mods = set()
    for name in quant:
        if name.endswith(".qweight"):
            mods.add(name[: -len(".qweight")])
    for mod in sorted(mods):
        rest = mod[len("model.layers.") :]
        idx_s, sub = rest.split(".", 1)
        tgt = _HF_QUANT_MAP[sub]
        qw, qz, sc = (
            np.asarray(quant[f"{mod}.qweight"]),
            np.asarray(quant[f"{mod}.qzeros"]),
            np.asarray(quant[f"{mod}.scales"], np.float32),
        )
        if method == "awq":
            q, z, s = unpack_awq(qw, qz, sc)
        else:
            q, z, s = unpack_gptq(
                qw, qz, sc, v2=gptq_v2, g_idx=quant.get(f"{mod}.g_idx")
            )
        per_target[tgt][int(idx_s)] = (q, z, s)

    layers_q = {}
    for tgt, by_layer in per_target.items():
        if not by_layer:
            continue
        assert sorted(by_layer) == list(range(num_layers)), (
            f"missing quantized layers for {tgt}"
        )
        qs = [by_layer[i][0] for i in range(num_layers)]
        zs = [by_layer[i][1] for i in range(num_layers)]
        ss = [by_layer[i][2] for i in range(num_layers)]
        layers_q[tgt] = _to_plane_format(qs, zs, ss, dtype)
    return layers_q
