"""Llama-4 text model (Scout/Maverick decoders).

Beyond the reference's model zoo. Architecture specifics vs Llama-3:

- interleaved-pair (complex) rope on most layers; every
  ``no_rope_layers[l] == 0`` layer is NoPE, where attention-temperature
  tuning scales q by ``log1p(floor((pos+1)/floor_scale)) * attn_scale + 1``
- optional L2 qk-norm AFTER rope (unit-weight rms norm; Scout)
- rope layers attend within ``attention_chunk_size`` chunks
  (block-diagonal causal; ops/attention/xla_backend.py chunk_size mask);
  NoPE layers attend globally
- MoE layers (``moe_layers``): router = top-k -> SIGMOID of selected
  logits, weights scale the expert INPUT (exact: silu(0)*0 = 0, so
  non-selected tokens contribute nothing); a shared dense expert always
  adds in. Dense layers use a plain MLP of width intermediate_size_mlp.

Layers differ structurally (dense vs MoE), so params are a per-layer LIST
of dicts and the forward unrolls the layer loop (no scan).
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
    apply_rope_interleaved,
    compute_inv_freq,
    rms_norm,
    silu_mul,
)
from scratchpad_tpu.ops.attention import write_kv
from scratchpad_tpu.ops.attention.xla_backend import (
    decode_attention_xla,
    extend_attention_xla,
)


class Llama4ForCausalLM:
    page_size: int = 16
    supports_pallas_attention = False  # per-layer chunked/global masks (extend)
    # decode rides the gqa kernel's dynamic-mask path (chunked masks)
    dynamic_mask_decode = True

    def __init__(self, cfg: ModelConfig):
        assert cfg.num_experts > 0, "Llama4 text is MoE"
        self.cfg = cfg
        self.inv_freq = compute_inv_freq(cfg)
        self.sm_scale = cfg.head_dim**-0.5
        self.decode_attention = decode_attention_xla
        self.extend_attention = extend_attention_xla
        L = cfg.num_hidden_layers
        self.use_rope = [
            bool((cfg.no_rope_layers or [1] * L)[l]) for l in range(L)
        ]
        step = cfg.interleave_moe_layer_step or 1
        self.moe_layers = set(
            cfg.moe_layers
            if cfg.moe_layers is not None
            else list(range(step - 1, L, step))
        )

    # ------------------------------------------------------------ parameters

    def init_params(self, rng: jax.Array, dtype=jnp.bfloat16) -> dict[str, Any]:
        cfg = self.cfg
        H, L, E = cfg.hidden_size, cfg.num_hidden_layers, cfg.num_experts
        D, Hq, Hkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_kv_heads
        I = cfg.intermediate_size
        Im = cfg.intermediate_size_mlp or cfg.intermediate_size
        V = cfg.vocab_size
        key = [rng]

        def init(shape, scale_dim):
            key[0], k = jax.random.split(key[0])
            return (
                jax.random.normal(k, shape, jnp.float32) / np.sqrt(scale_dim)
            ).astype(dtype)

        layers = []
        for l in range(L):
            lp = {
                "input_norm": jnp.ones((H,), dtype),
                "post_norm": jnp.ones((H,), dtype),
                "wq": init((H, Hq * D), H),
                "wk": init((H, Hkv * D), H),
                "wv": init((H, Hkv * D), H),
                "wo": init((Hq * D, H), Hq * D),
            }
            if l in self.moe_layers:
                lp.update(
                    router=init((H, E), H),
                    gate_up=init((E, H, 2 * I), H),
                    down=init((E, I, H), I),
                    s_gate=init((H, I), H),
                    s_up=init((H, I), H),
                    s_down=init((I, H), I),
                )
            else:
                lp.update(
                    gate=init((H, Im), H),
                    up=init((H, Im), H),
                    down_d=init((Im, H), Im),
                )
            layers.append(lp)
        params = {
            "embed": init((V, H), H),
            "layers": layers,
            "final_norm": jnp.ones((H,), dtype),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = init((V, H), H)
        return params

    def param_specs(self, tp_axis: str = "tp") -> dict[str, Any]:
        t = tp_axis
        layers = []
        for l in range(self.cfg.num_hidden_layers):
            lp = {
                "input_norm": P(None),
                "post_norm": P(None),
                "wq": P(None, t),
                "wk": P(None, t),
                "wv": P(None, t),
                "wo": P(t, None),
            }
            if l in self.moe_layers:
                lp.update(
                    router=P(None, None),
                    gate_up=P(None, None, t),
                    down=P(None, t, None),
                    s_gate=P(None, t),
                    s_up=P(None, t),
                    s_down=P(t, None),
                )
            else:
                lp.update(gate=P(None, t), up=P(None, t), down_d=P(t, None))
            layers.append(lp)
        specs = {
            "embed": P(t, None),
            "layers": layers,
            "final_norm": P(None),
        }
        if not self.cfg.tie_word_embeddings:
            specs["lm_head"] = P(t, None)
        return specs

    _HF_SUB = {
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.o_proj.weight": ("wo", True),
        "input_layernorm.weight": ("input_norm", False),
        "post_attention_layernorm.weight": ("post_norm", False),
        "feed_forward.router.weight": ("router", True),
        "feed_forward.experts.gate_up_proj": ("gate_up", False),
        "feed_forward.experts.down_proj": ("down", False),
        "feed_forward.shared_expert.gate_proj.weight": ("s_gate", True),
        "feed_forward.shared_expert.up_proj.weight": ("s_up", True),
        "feed_forward.shared_expert.down_proj.weight": ("s_down", True),
        "feed_forward.gate_proj.weight": ("gate", True),
        "feed_forward.up_proj.weight": ("up", True),
        "feed_forward.down_proj.weight": ("down_d", True),
    }

    def convert_hf_state(self, state, dtype=jnp.bfloat16):
        cfg = self.cfg
        L = cfg.num_hidden_layers
        layers: list[dict] = [{} for _ in range(L)]
        out: dict[str, Any] = {}
        for name, w in state.items():
            if name.startswith("model.layers."):
                rest = name[len("model.layers.") :]
                l_s, sub = rest.split(".", 1)
                tgt, transpose = self._HF_SUB[sub]
                layers[int(l_s)][tgt] = w.T if transpose else w
            elif name == "model.embed_tokens.weight":
                out["embed"] = w
            elif name == "model.norm.weight":
                out["final_norm"] = w
            elif name == "lm_head.weight":
                if not cfg.tie_word_embeddings:
                    out["lm_head"] = w
            else:
                raise KeyError(f"unmapped {name}")
        out["layers"] = layers
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), out)

    # ---------------------------------------------------------------- ffw

    def _moe(self, h: jax.Array, lp: dict) -> jax.Array:
        cfg = self.cfg
        E, K = cfg.num_experts, cfg.num_experts_per_tok
        logits = (h @ lp["router"]).astype(jnp.float32)  # [T, E]
        topv, topi = jax.lax.top_k(logits, K)
        w_full = jnp.full_like(logits, -jnp.inf)
        for k in range(K):
            w_full = jnp.where(
                jax.nn.one_hot(topi[:, k], E, dtype=jnp.bool_),
                topv[:, k : k + 1],
                w_full,
            )
        w_full = jax.nn.sigmoid(w_full)  # sigmoid(-inf) = 0 for unselected
        # weights scale the expert INPUT (HF Llama4TextMoe); zero input
        # rows produce exactly zero output (silu(0)*0 @ down = 0)
        y = silu_mul(h @ lp["s_gate"], h @ lp["s_up"]) @ lp["s_down"]
        I = cfg.intermediate_size
        for e in range(E):
            he = h * w_full[:, e : e + 1].astype(h.dtype)
            gu = he @ lp["gate_up"][e]
            y = y + silu_mul(gu[..., :I], gu[..., I:]) @ lp["down"][e]
        return y

    # ------------------------------------------------------------- forward

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
        # NoPE temperature tuning (per-token, position-dependent)
        attn_scales = (
            jnp.log1p(
                jnp.floor((meta.positions.astype(jnp.float32) + 1.0) / cfg.floor_scale)
            )
            * cfg.attn_scale
            + 1.0
        )[:, None, None]

        for l in range(L):
            lp = params["layers"][l]
            lidx = jnp.int32(l)
            h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
            q = (h @ lp["wq"]).reshape(T, Hq, D)
            kn = (h @ lp["wk"]).reshape(T, Hkv, D)
            vn = (h @ lp["wv"]).reshape(T, Hkv, D)
            if self.use_rope[l]:
                q = apply_rope_interleaved(q, meta.positions, inv_freq)
                kn = apply_rope_interleaved(kn, meta.positions, inv_freq)
                if cfg.use_qk_norm:
                    # L2 norm = unit-weight rms norm
                    one = jnp.ones((D,), q.dtype)
                    q = rms_norm(q, one, cfg.rms_norm_eps)
                    kn = rms_norm(kn, one, cfg.rms_norm_eps)
            elif cfg.attn_temperature_tuning:
                q = (q * attn_scales).astype(q.dtype)
            kv = write_kv(kv, kn, vn, lidx, meta.out_cache_loc)
            chunk = (
                cfg.attention_chunk_size
                if (self.use_rope[l] and cfg.attention_chunk_size)
                else None
            )
            attn = attend(
                q,
                kv,
                lidx,
                meta,
                page_size=self.page_size,
                sm_scale=self.sm_scale,
                logit_cap=None,
                sliding_window=None,
                chunk_size=chunk,
            )
            x = x + attn.reshape(T, Hq * D) @ lp["wo"]
            h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            if l in self.moe_layers:
                x = x + self._moe(h2, lp)
            else:
                x = x + silu_mul(h2 @ lp["gate"], h2 @ lp["up"]) @ lp["down_d"]

        h = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        if getattr(meta, "capture_all_hidden", False):
            return kv, h
        if getattr(meta, "capture_hidden", False):
            return kv, jnp.take(h, meta.last_token_idx, axis=0)
        last = jnp.take(h, meta.last_token_idx, axis=0)
        head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
        logits = (last @ head.T).astype(jnp.float32)
        return kv, logits
