"""GPT-OSS (OpenAI open-weight MoE, 20B/120B).

Beyond the reference's model zoo (scratchpad/nn/models has no GPT-OSS).
Architecture vs the Mixtral-style decoder:

- alternating sliding/full attention per layer (HF ``layer_types``)
- learned per-head ATTENTION SINKS: a logit that joins the softmax
  denominator but contributes no value (ops/attention/xla_backend.py
  grows a ``sinks`` kwarg for this)
- biased q/k/v/o projections
- MoE with interleaved gate/up expert weights, clamped swiglu
  (gate.clamp(max=7) * sigmoid(1.702*gate) * (up.clamp(+-7)+1)) and
  top-k-then-softmax routing (softmax over the k selected logits,
  NOT over all experts)
- YaRN rope (factor 32), handled by common.compute_inv_freq +
  rope_attention_scale folding mscale^2 into sm_scale.

Per-layer dynamic windows + sinks need the masked XLA attention backend
(like Gemma), so supports_pallas_attention = False.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
from scratchpad_tpu.memory.kv_cache import KVCache
from scratchpad_tpu.models.common import (
    apply_rope,
    compute_inv_freq,
    rms_norm,
    rope_attention_scale,
    shard_rows,
)
from scratchpad_tpu.ops.attention import write_kv
from scratchpad_tpu.ops.attention.xla_backend import (
    decode_attention_xla,
    extend_attention_xla,
)

_BIG_WINDOW = 1 << 30
_ALPHA = 1.702
_LIMIT = 7.0


class GptOssForCausalLM:
    page_size: int = 16
    supports_pallas_attention = False  # per-layer windows + sinks (extend)
    # decode rides the gqa kernel's dynamic-mask path (traced window +
    # in-kernel sinks) when serving single-device TPU
    dynamic_mask_decode = True
    # DP attention (models/common.py dp_attention_respec)
    ATTN_PARAM_KEYS = frozenset(
        {"wq", "wk", "wv", "wo", "bq", "bk", "bv", "bo", "sinks"}
    )
    dp_attention: bool = False

    def __init__(self, cfg: ModelConfig):
        assert cfg.num_experts > 0, "GPT-OSS is MoE"
        self.cfg = cfg
        self.inv_freq = compute_inv_freq(cfg)
        self.sm_scale = rope_attention_scale(cfg) / np.sqrt(cfg.head_dim)
        self.decode_attention = decode_attention_xla
        self.extend_attention = extend_attention_xla
        from scratchpad_tpu.models.common import make_quant_matmul

        self.quant_matmul = make_quant_matmul()

    def _layer_windows(self) -> np.ndarray:
        cfg = self.cfg
        L = cfg.num_hidden_layers
        kinds = cfg.layer_types or [
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(L)
        ]
        return np.array(
            [
                cfg.sliding_window
                if (k == "sliding_attention" and cfg.sliding_window)
                else _BIG_WINDOW
                for k in kinds
            ],
            np.int32,
        )

    # ------------------------------------------------------------ parameters

    def init_params(self, rng: jax.Array, dtype=jnp.bfloat16) -> dict[str, Any]:
        cfg = self.cfg
        H, L, E = cfg.hidden_size, cfg.num_hidden_layers, cfg.num_experts
        D, Hq, Hkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_kv_heads
        I = cfg.intermediate_size
        V = cfg.vocab_size
        keys = iter(jax.random.split(rng, 16))

        def init(key, shape, scale_dim):
            n = int(np.prod(shape))
            if n > 2**28:  # 20B-class expert stacks: stream via numpy
                from scratchpad_tpu.models.common import init_stacked_lean

                seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
                return init_stacked_lean(seed, shape, scale_dim, dtype)
            return (
                jax.random.normal(key, shape, jnp.float32) / np.sqrt(scale_dim)
            ).astype(dtype)

        params = {
            "embed": init(next(keys), (V, H), H),
            "layers": {
                "input_norm": jnp.ones((L, H), dtype),
                "post_norm": jnp.ones((L, H), dtype),
                "wq": init(next(keys), (L, H, Hq * D), H),
                "bq": jnp.zeros((L, Hq * D), dtype),
                "wk": init(next(keys), (L, H, Hkv * D), H),
                "bk": jnp.zeros((L, Hkv * D), dtype),
                "wv": init(next(keys), (L, H, Hkv * D), H),
                "bv": jnp.zeros((L, Hkv * D), dtype),
                "wo": init(next(keys), (L, Hq * D, H), Hq * D),
                "bo": jnp.zeros((L, H), dtype),
                "sinks": jnp.zeros((L, Hq), dtype),
                "router_w": init(next(keys), (L, H, E), H),
                "router_b": jnp.zeros((L, E), dtype),
                "gate_up": init(next(keys), (L, E, H, 2 * I), H),
                "gate_up_b": jnp.zeros((L, E, 2 * I), dtype),
                "down": init(next(keys), (L, E, I, H), I),
                "down_b": jnp.zeros((L, E, H), dtype),
            },
            "final_norm": jnp.ones((H,), dtype),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = init(next(keys), (V, H), H)
        return params

    def param_specs(self, tp_axis: str = "tp") -> dict[str, Any]:
        t = tp_axis
        specs = {
            "embed": P(t, None),
            "layers": {
                "input_norm": P(None, None),
                "post_norm": P(None, None),
                "wq": P(None, None, t),
                "bq": P(None, t),
                "wk": P(None, None, t),
                "bk": P(None, t),
                "wv": P(None, None, t),
                "bv": P(None, t),
                "wo": P(None, t, None),
                "bo": P(None, None),
                "sinks": P(None, None),
                "router_w": P(None, None, None),
                "router_b": P(None, None),
                "gate_up": P(None, None, None, None),
                "gate_up_b": P(None, None, None),
                "down": P(None, None, None, None),
                "down_b": P(None, None, None),
            },
            "final_norm": P(None),
        }
        if not self.cfg.tie_word_embeddings:
            specs["lm_head"] = P(t, None)
        return specs

    _HF_SUB = {
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.q_proj.bias": ("bq", False),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.k_proj.bias": ("bk", False),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.v_proj.bias": ("bv", False),
        "self_attn.o_proj.weight": ("wo", True),
        "self_attn.o_proj.bias": ("bo", False),
        "self_attn.sinks": ("sinks", False),
        "mlp.router.weight": ("router_w", True),
        "mlp.router.bias": ("router_b", False),
        "mlp.experts.gate_up_proj": ("gate_up", False),
        "mlp.experts.gate_up_proj_bias": ("gate_up_b", False),
        "mlp.experts.down_proj": ("down", False),
        "mlp.experts.down_proj_bias": ("down_b", False),
        "input_layernorm.weight": ("input_norm", False),
        "post_attention_layernorm.weight": ("post_norm", False),
    }

    def convert_hf_state(self, state, dtype=jnp.bfloat16):
        cfg = self.cfg
        L = cfg.num_hidden_layers
        layers: dict[str, list] = {}
        out: dict[str, Any] = {"layers": {}}
        for name, w in state.items():
            if name.startswith("model.layers."):
                rest = name[len("model.layers.") :]
                l_s, sub = rest.split(".", 1)
                tgt, transpose = self._HF_SUB[sub]
                layers.setdefault(tgt, [None] * L)[int(l_s)] = (
                    w.T if transpose else w
                )
            elif name == "model.embed_tokens.weight":
                out["embed"] = w
            elif name == "model.norm.weight":
                out["final_norm"] = w
            elif name == "lm_head.weight":
                if not cfg.tie_word_embeddings:
                    out["lm_head"] = w
            else:
                raise KeyError(f"unmapped {name}")
        for k, ws in layers.items():
            out["layers"][k] = np.stack(ws)
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), out)

    # ---------------------------------------------------------------- moe

    def _moe(self, h: jax.Array, lp: dict, lidx=None, qlayers=None) -> jax.Array:
        cfg = self.cfg
        E, K = cfg.num_experts, cfg.num_experts_per_tok
        logits = (h @ lp["router_w"] + lp["router_b"]).astype(jnp.float32)
        topv, topi = jax.lax.top_k(logits, K)  # [T, K]
        topv = jax.nn.softmax(topv, axis=-1)  # softmax over the SELECTED k
        w_full = jnp.zeros((h.shape[0], E), jnp.float32)
        for k in range(K):
            w_full = w_full + jax.nn.one_hot(topi[:, k], E) * topv[:, k : k + 1]
        # quantized experts: flat (layer, expert) index into the W4 stacks
        # (the triteia-sbmm role, reference: llama_quant_moe.py:29-36);
        # biases stay bf16 in lp
        quant = qlayers is not None and "gate_up" in qlayers
        y = jnp.zeros_like(h)
        for e in range(E):
            if quant:
                fe = lidx * E + e
                gu = self.quant_matmul(h, qlayers["gate_up"], fe)
                gu = gu + lp["gate_up_b"][e]
            else:
                gu = h @ lp["gate_up"][e] + lp["gate_up_b"][e]
            gate, up = gu[..., 0::2], gu[..., 1::2]
            gate = jnp.minimum(gate, _LIMIT)
            up = jnp.clip(up, -_LIMIT, _LIMIT)
            glu = gate * jax.nn.sigmoid(gate * _ALPHA)
            act = (up + 1.0) * glu
            if quant:
                contrib = self.quant_matmul(act, qlayers["down"], fe)
                contrib = contrib + lp["down_b"][e]
            else:
                contrib = act @ lp["down"][e] + lp["down_b"][e]
            y = y + contrib * w_full[:, e : e + 1].astype(h.dtype)
        return y

    # ------------------------------------------------------------- forward

    def __call__(self, params: dict, kv: KVCache, meta: ForwardMeta):
        cfg = self.cfg
        L = cfg.num_hidden_layers
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        T = meta.num_tokens
        inv_freq = jnp.asarray(self.inv_freq)
        windows = np.asarray(self._layer_windows())

        x = jnp.take(params["embed"], meta.tokens, axis=0)
        attend = (
            self.decode_attention
            if meta.mode == ForwardMode.DECODE
            else self.extend_attention
        )

        qlayers = params.get("layers_q")
        dpa_mesh = self.mesh if getattr(self, "dp_attention", False) else None

        def lin(x_, lp, name, lidx):
            if qlayers is not None and name in qlayers:
                ql = qlayers[name]
                from scratchpad_tpu.ops.quant.fp8 import Fp8Linear, fp8_matmul

                if isinstance(ql, Fp8Linear):
                    return fp8_matmul(x_, ql, lidx)
                return self.quant_matmul(x_, ql, lidx)
            return x_ @ lp[name]

        def body(carry, layer):
            x, kv_c = carry
            lp, lidx, window = layer
            h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
            q = shard_rows(
                (lin(h, lp, "wq", lidx) + lp["bq"]).reshape(T, Hq, D),
                dpa_mesh, ("dp", "tp"),
            )
            kn = shard_rows(
                (lin(h, lp, "wk", lidx) + lp["bk"]).reshape(T, Hkv, D),
                dpa_mesh, ("dp", "tp"),
            )
            vn = shard_rows(
                (lin(h, lp, "wv", lidx) + lp["bv"]).reshape(T, Hkv, D),
                dpa_mesh, ("dp", "tp"),
            )
            q = apply_rope(q, meta.positions, inv_freq)
            kn = apply_rope(kn, meta.positions, inv_freq)
            kv_c = write_kv(kv_c, kn, vn, lidx, meta.out_cache_loc)
            attn = attend(
                q,
                kv_c,
                lidx,
                meta,
                page_size=self.page_size,
                sm_scale=self.sm_scale,
                logit_cap=None,
                sliding_window=window,
                sinks=lp["sinks"],
            )
            attn = shard_rows(attn, dpa_mesh, ("dp", "tp"))
            x = x + (lin(attn.reshape(T, Hq * D), lp, "wo", lidx) + lp["bo"])
            # back to dp rows: the MoE runs tensor-parallel over tp
            x = shard_rows(x, dpa_mesh, "dp")
            h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            x = x + self._moe(h2, lp, lidx, qlayers)
            return (x, kv_c), None

        from scratchpad_tpu.models.common import scan_layers

        (x, kv_out), _ = scan_layers(
            body,
            (x, kv),
            (params["layers"], np.arange(L, dtype=np.int32), windows),
        )
        h = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        if getattr(meta, "capture_all_hidden", False):
            return kv_out, h
        if getattr(meta, "capture_hidden", False):
            return kv_out, jnp.take(h, meta.last_token_idx, axis=0)
        last = jnp.take(h, meta.last_token_idx, axis=0)
        head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
        logits = (last @ head.T).astype(jnp.float32)
        return kv_out, logits
