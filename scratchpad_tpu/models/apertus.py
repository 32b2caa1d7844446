"""SwissAI Apertus (reference: scratchpad/nn/models/swissai/apertus.py:311).

The reference's flagship production model family: Llama-style attention with
per-head qk RMSNorm, and a gateless MLP with the xIELU activation

    f(x) = softplus(a_p) x^2 + b x                    for x > 0
           (expm1(min(x, eps)) - x)(b + softplus(a_n)) + b x   otherwise

where a_p / a_n are learned per-layer scalars (reference:
scratchpad/nn/layers/activation.py:34 XIELU).
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
from scratchpad_tpu.models.common import apply_rope, compute_inv_freq, rms_norm
from scratchpad_tpu.ops.attention import write_kv
from scratchpad_tpu.ops.attention.xla_backend import (
    decode_attention_xla,
    extend_attention_xla,
)


def xielu(x: jax.Array, alpha_p: jax.Array, alpha_n: jax.Array,
          beta: float = 0.5, eps: float = -1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    ap = jax.nn.softplus(alpha_p.astype(jnp.float32))
    an = beta + jax.nn.softplus(alpha_n.astype(jnp.float32))
    pos = ap * xf * xf + beta * xf
    neg = (jnp.expm1(jnp.minimum(xf, eps)) - xf) * an + beta * xf
    return jnp.where(xf > 0, pos, neg).astype(x.dtype)


class ApertusForCausalLM:
    page_size: int = 16

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.inv_freq = compute_inv_freq(cfg)
        self.sm_scale = cfg.head_dim**-0.5
        self.decode_attention = decode_attention_xla
        self.extend_attention = extend_attention_xla

    def init_params(self, rng: jax.Array, dtype=jnp.bfloat16) -> dict[str, Any]:
        cfg = self.cfg
        H, L = cfg.hidden_size, cfg.num_hidden_layers
        D, Hq, Hkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_kv_heads
        I, V = cfg.intermediate_size, cfg.vocab_size
        keys = iter(jax.random.split(rng, 16))

        def init(key, shape, scale_dim):
            return (
                jax.random.normal(key, shape, jnp.float32) / np.sqrt(scale_dim)
            ).astype(dtype)

        params = {
            "embed": init(next(keys), (V, H), H),
            "layers": {
                "attn_norm": jnp.ones((L, H), dtype),
                "ffw_norm": jnp.ones((L, H), dtype),
                "q_norm": jnp.ones((L, D), dtype),
                "k_norm": jnp.ones((L, D), dtype),
                "wq": init(next(keys), (L, H, Hq * D), H),
                "wk": init(next(keys), (L, H, Hkv * D), H),
                "wv": init(next(keys), (L, H, Hkv * D), H),
                "wo": init(next(keys), (L, Hq * D, H), Hq * D),
                "up": init(next(keys), (L, H, I), H),
                "down": init(next(keys), (L, I, H), I),
                "alpha_p": jnp.full((L, 1), 0.8, jnp.float32),
                "alpha_n": jnp.full((L, 1), 0.8, jnp.float32),
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
                "attn_norm": P(None, None),
                "ffw_norm": P(None, None),
                "q_norm": P(None, None),
                "k_norm": P(None, None),
                "wq": P(None, None, t),
                "wk": P(None, None, t),
                "wv": P(None, None, t),
                "wo": P(None, t, None),
                "up": P(None, None, t),
                "down": P(None, t, None),
                "alpha_p": P(None, None),
                "alpha_n": P(None, None),
            },
            "final_norm": P(None),
        }
        if not self.cfg.tie_word_embeddings:
            specs["lm_head"] = P(t, None)
        return specs

    HF_LAYER_MAP = {
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.o_proj.weight": ("wo", True),
        "self_attn.q_norm.weight": ("q_norm", False),
        "self_attn.k_norm.weight": ("k_norm", False),
        "mlp.up_proj.weight": ("up", True),
        "mlp.down_proj.weight": ("down", True),
        "mlp.act_fn.alpha_p": ("alpha_p", False),
        "mlp.act_fn.alpha_n": ("alpha_n", False),
        "attention_layernorm.weight": ("attn_norm", False),
        "feedforward_layernorm.weight": ("ffw_norm", False),
    }

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.bfloat16):
        cfg = self.cfg
        L = cfg.num_hidden_layers
        layers: dict[str, list] = {}
        out: dict[str, Any] = {"layers": {}}
        for name, w in state.items():
            if name.startswith("model.layers."):
                rest = name[len("model.layers.") :]
                idx_s, sub = rest.split(".", 1)
                if sub.endswith(("act_fn.beta", "act_fn.eps")):
                    continue  # constants
                tgt, transpose = self.HF_LAYER_MAP[sub]
                w = np.atleast_1d(np.asarray(w))
                layers.setdefault(tgt, [None] * L)[int(idx_s)] = (
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
                raise KeyError(f"unmapped HF weight {name}")
        for k, ws in layers.items():
            assert all(x is not None for x in ws), f"missing layers for {k}"
            out["layers"][k] = np.stack(ws)
        res = {}
        for k, v in out.items():
            if k == "layers":
                res["layers"] = {
                    kk: jnp.asarray(
                        vv, jnp.float32 if kk.startswith("alpha") else dtype
                    )
                    for kk, vv in v.items()
                }
            else:
                res[k] = jnp.asarray(v, dtype)
        return res

    def __call__(self, params: dict, kv: KVCache, meta: ForwardMeta):
        cfg = self.cfg
        L = cfg.num_hidden_layers
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        T = meta.num_tokens
        inv_freq = jnp.asarray(self.inv_freq)

        x = jnp.take(params["embed"], meta.tokens, axis=0)
        attend = (
            self.decode_attention
            if meta.mode == ForwardMode.DECODE
            else self.extend_attention
        )

        def body(carry, layer):
            x, kv_c = carry
            lp, lidx = layer
            h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
            q = (h @ lp["wq"]).reshape(T, Hq, D)
            kn = (h @ lp["wk"]).reshape(T, Hkv, D)
            vn = (h @ lp["wv"]).reshape(T, Hkv, D)
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
            kn = rms_norm(kn, lp["k_norm"], cfg.rms_norm_eps)
            q = apply_rope(q, meta.positions, inv_freq)
            kn = apply_rope(kn, meta.positions, inv_freq)
            kv_c = write_kv(kv_c, kn, vn, lidx, meta.out_cache_loc)
            attn = attend(
                q, kv_c, lidx, meta,
                page_size=self.page_size,
                sm_scale=self.sm_scale,
                logit_cap=None,
                sliding_window=None,
            )
            x = x + attn.reshape(T, Hq * D) @ lp["wo"]
            h2 = rms_norm(x, lp["ffw_norm"], cfg.rms_norm_eps)
            x = x + xielu(h2 @ lp["up"], lp["alpha_p"], lp["alpha_n"]) @ lp["down"]
            return (x, kv_c), None

        from scratchpad_tpu.models.common import scan_layers

        (x, kv_out), _ = scan_layers(
            body, (x, kv), (params["layers"], np.arange(L, dtype=np.int32))
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
