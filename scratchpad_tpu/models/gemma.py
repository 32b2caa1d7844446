"""Gemma 2 / Gemma 3 (text) family.

(reference: scratchpad/nn/models/gemma/gemma3.py:525 and gemma2.py)

Differences from the Llama decoder, all handled in one lax.scan:
- RMSNorm multiplies by (1 + weight) (zero-centered checkpoint weights)
- embeddings scaled by sqrt(hidden); gelu_tanh MLP
- four norms per layer (pre/post attention, pre/post ffw)
- attention/final logit softcaps (Gemma2)
- alternating local (sliding-window) and global attention layers; the
  window size rides through the mask as a per-layer dynamic value so the
  layer scan stays uniform
- Gemma3: separate rope bases for local (10k) and global (1M) layers and
  qk-norm; per-layer inv_freq is selected inside the scan
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
from scratchpad_tpu.models.common import apply_rope, gelu_mul
from scratchpad_tpu.ops.attention import write_kv
from scratchpad_tpu.ops.attention.xla_backend import (
    decode_attention_xla,
    extend_attention_xla,
)

_BIG_WINDOW = 1 << 30  # "no sliding window" sentinel


def gemma_rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMSNorm with (1 + w) scaling (reference: Gemma3RMSNorm,
    scratchpad/nn/layers/layernorm.py:54)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * (1.0 + weight.astype(jnp.float32))).astype(dtype)


class GemmaForCausalLM:
    page_size: int = 16
    # dynamic per-layer sliding windows need the masked XLA backend (extend)
    supports_pallas_attention = False
    # decode rides the gqa kernel's dynamic-mask path (traced window)
    dynamic_mask_decode = True
    # extend alternates ONE fixed window with full attention -> the ragged
    # kernel serves both variants under lax.cond (make_window_cond_extend)
    window_cond_extend = True

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        D = cfg.head_dim
        if cfg.query_pre_attn_scalar is not None:
            self.sm_scale = float(cfg.query_pre_attn_scalar) ** -0.5
        else:
            self.sm_scale = D ** -0.5
        # dual rope bases: Gemma3 local layers use 10k, global layers the
        # configured rope_theta; Gemma2 uses one base for both
        base_global = cfg.rope_theta
        base_local = 10000.0 if self.is_gemma3 else cfg.rope_theta
        ar = np.arange(0, D, 2, dtype=np.float64) / D
        self.inv_freq_global = (1.0 / (base_global**ar)).astype(np.float32)
        if cfg.rope_scaling and cfg.rope_scaling.get("factor"):
            self.inv_freq_global /= cfg.rope_scaling["factor"]
        self.inv_freq_local = (1.0 / (base_local**ar)).astype(np.float32)
        self.decode_attention = decode_attention_xla
        self.extend_attention = extend_attention_xla
        self.quant_matmul = None  # quantization unsupported for gemma v1

    @property
    def is_gemma3(self) -> bool:
        return "Gemma3" in self.cfg.architecture

    def _is_local_layer(self, l: int) -> bool:
        pattern = self.cfg.sliding_window_pattern
        if self.is_gemma3:
            pattern = pattern or 6
            return (l + 1) % pattern != 0  # 5 local : 1 global
        return l % 2 == 0  # Gemma2 alternates starting local

    def _layer_flags(self):
        cfg = self.cfg
        L = cfg.num_hidden_layers
        local = np.array(
            [self._is_local_layer(l) for l in range(L)], dtype=bool
        )
        window = np.where(
            local & (cfg.sliding_window is not None),
            cfg.sliding_window or _BIG_WINDOW,
            _BIG_WINDOW,
        ).astype(np.int32)
        return local, window

    # ------------------------------------------------------------ parameters

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
                "input_norm": jnp.zeros((L, H), dtype),
                "post_attn_norm": jnp.zeros((L, H), dtype),
                "pre_ffw_norm": jnp.zeros((L, H), dtype),
                "post_ffw_norm": jnp.zeros((L, H), dtype),
                "wq": init(next(keys), (L, H, Hq * D), H),
                "wk": init(next(keys), (L, H, Hkv * D), H),
                "wv": init(next(keys), (L, H, Hkv * D), H),
                "wo": init(next(keys), (L, Hq * D, H), Hq * D),
                "gate": init(next(keys), (L, H, I), H),
                "up": init(next(keys), (L, H, I), H),
                "down": init(next(keys), (L, I, H), I),
            },
            "final_norm": jnp.zeros((H,), dtype),
        }
        if self.is_gemma3 or self.cfg.use_qk_norm:
            params["layers"]["q_norm"] = jnp.zeros((L, D), dtype)
            params["layers"]["k_norm"] = jnp.zeros((L, D), dtype)
        return params

    def param_specs(self, tp_axis: str = "tp") -> dict[str, Any]:
        t = tp_axis
        specs = {
            "embed": P(t, None),
            "layers": {
                "input_norm": P(None, None),
                "post_attn_norm": P(None, None),
                "pre_ffw_norm": P(None, None),
                "post_ffw_norm": P(None, None),
                "wq": P(None, None, t),
                "wk": P(None, None, t),
                "wv": P(None, None, t),
                "wo": P(None, t, None),
                "gate": P(None, None, t),
                "up": P(None, None, t),
                "down": P(None, t, None),
            },
            "final_norm": P(None),
        }
        if self.is_gemma3 or self.cfg.use_qk_norm:
            specs["layers"]["q_norm"] = P(None, None)
            specs["layers"]["k_norm"] = P(None, None)
        return specs

    HF_LAYER_MAP = {
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.o_proj.weight": ("wo", True),
        "self_attn.q_norm.weight": ("q_norm", False),
        "self_attn.k_norm.weight": ("k_norm", False),
        "mlp.gate_proj.weight": ("gate", True),
        "mlp.up_proj.weight": ("up", True),
        "mlp.down_proj.weight": ("down", True),
        "input_layernorm.weight": ("input_norm", False),
        "post_attention_layernorm.weight": ("post_attn_norm", False),
        "pre_feedforward_layernorm.weight": ("pre_ffw_norm", False),
        "post_feedforward_layernorm.weight": ("post_ffw_norm", False),
    }

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.bfloat16):
        L = self.cfg.num_hidden_layers
        layers: dict[str, list] = {}
        out: dict[str, Any] = {"layers": {}}
        for name, w in state.items():
            if name.startswith("model.layers."):
                rest = name[len("model.layers.") :]
                idx_s, sub = rest.split(".", 1)
                tgt, transpose = self.HF_LAYER_MAP[sub]
                layers.setdefault(tgt, [None] * L)[int(idx_s)] = (
                    w.T if transpose else w
                )
            elif name == "model.embed_tokens.weight":
                out["embed"] = w
            elif name == "model.norm.weight":
                out["final_norm"] = w
            elif name == "lm_head.weight":
                pass  # gemma always ties embeddings
            elif name.endswith("rotary_emb.inv_freq"):
                pass
            else:
                raise KeyError(f"unmapped HF weight {name}")
        for k, ws in layers.items():
            assert all(x is not None for x in ws), f"missing layers for {k}"
            out["layers"][k] = np.stack(ws)
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), out)

    # ---------------------------------------------------------------- forward

    def __call__(self, params: dict, kv: KVCache, meta: ForwardMeta):
        cfg = self.cfg
        L = cfg.num_hidden_layers
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        T = meta.num_tokens
        eps = cfg.rms_norm_eps
        inv_g = jnp.asarray(self.inv_freq_global)
        inv_l = jnp.asarray(self.inv_freq_local)
        local_flags, windows = self._layer_flags()
        local_flags = np.asarray(local_flags)
        windows = np.asarray(windows)

        x = jnp.take(params["embed"], meta.tokens, axis=0)
        x = x * jnp.asarray(np.sqrt(cfg.hidden_size), x.dtype)  # embed scale
        if meta.input_embeds is not None:
            # multimodal rows (negative placeholder ids) carry projected
            # vision features, spliced UNSCALED like HF Gemma3
            x = jnp.where(
                (meta.tokens < 0)[:, None],
                meta.input_embeds.astype(x.dtype),
                x,
            )

        if meta.mode == ForwardMode.DECODE:
            attend = self.decode_attention
        else:
            attend = self.extend_attention

        def body(carry, layer):
            x, kv_c = carry
            lp, lidx, is_local, window = layer
            h = gemma_rms_norm(x, lp["input_norm"], eps)
            q = (h @ lp["wq"]).reshape(T, Hq, D)
            kn = (h @ lp["wk"]).reshape(T, Hkv, D)
            vn = (h @ lp["wv"]).reshape(T, Hkv, D)
            if "q_norm" in lp:
                q = gemma_rms_norm(q, lp["q_norm"], eps)
                kn = gemma_rms_norm(kn, lp["k_norm"], eps)
            inv = jnp.where(is_local, inv_l, inv_g)
            q = apply_rope(q, meta.positions, inv)
            kn = apply_rope(kn, meta.positions, inv)
            kv_c = write_kv(kv_c, kn, vn, lidx, meta.out_cache_loc)
            attn = attend(
                q,
                kv_c,
                lidx,
                meta,
                page_size=self.page_size,
                sm_scale=self.sm_scale,
                logit_cap=cfg.attn_logit_softcap,
                sliding_window=window,
            )
            attn_out = attn.reshape(T, Hq * D) @ lp["wo"]
            x = x + gemma_rms_norm(attn_out, lp["post_attn_norm"], eps)
            h2 = gemma_rms_norm(x, lp["pre_ffw_norm"], eps)
            mlp = gelu_mul(h2 @ lp["gate"], h2 @ lp["up"]) @ lp["down"]
            x = x + gemma_rms_norm(mlp, lp["post_ffw_norm"], eps)
            return (x, kv_c), None

        from scratchpad_tpu.models.common import scan_layers

        (x, kv_out), _ = scan_layers(
            body,
            (x, kv),
            (
                params["layers"],
                np.arange(L, dtype=np.int32),
                local_flags,
                windows,
            ),
        )

        h = gemma_rms_norm(x, params["final_norm"], eps)
        if getattr(meta, "capture_all_hidden", False):
            return kv_out, h
        if getattr(meta, "capture_hidden", False):
            return kv_out, jnp.take(h, meta.last_token_idx, axis=0)
        last = jnp.take(h, meta.last_token_idx, axis=0)
        logits = (last @ params["embed"].T).astype(jnp.float32)
        if cfg.logit_softcap:
            logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
        return kv_out, logits


class Gemma2ForCausalLM(GemmaForCausalLM):
    pass


class Gemma3ForCausalLM(GemmaForCausalLM):
    def __init__(self, cfg: ModelConfig):
        cfg.use_qk_norm = True
        super().__init__(cfg)


class Gemma3ForConditionalGeneration(Gemma3ForCausalLM):
    """Gemma-3 multimodal: SigLIP tower + avg-pool/rms-norm projector +
    the Gemma3 text decoder (reference:
    scratchpad/nn/models/gemma/gemma3_mm.py:86). Image spans attend
    BIDIRECTIONALLY (HF token-type mask; reference builds the same masks
    at gemma3_mm.py:212-232) — plumbed here as per-request absolute span
    tables consumed by the masked XLA extend."""

    is_multimodal = True
    bidirectional_image_attention = True
    # span masks need the masked XLA extend; the ragged kernel's lax.cond
    # window variants have no span support
    window_cond_extend = False

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        from scratchpad_tpu.models.vision import SigLIPVisionTower

        mm = cfg.multimodal or {}
        assert "vision_config" in mm, "Gemma3-MM needs multimodal.vision_config"
        self.image_token_index = mm.get("image_token_index", 262144)
        self.vision = SigLIPVisionTower(mm["vision_config"])
        self.mm_tokens_per_image = mm.get("mm_tokens_per_image", 256)
        tps = int(round(self.mm_tokens_per_image**0.5))
        assert tps * tps == self.mm_tokens_per_image
        ppi = self.vision.image_size // self.vision.patch
        assert ppi % tps == 0, (ppi, tps)
        self.pool_kernel = ppi // tps
        self.tokens_per_side = tps
        # SigLIP normalization (mean/std 0.5) instead of CLIP's
        self.image_mean = (0.5, 0.5, 0.5)
        self.image_std = (0.5, 0.5, 0.5)

    @property
    def num_image_tokens(self) -> int:
        return self.mm_tokens_per_image

    # ------------------------------------------------------------ parameters

    def init_params(self, rng: jax.Array, dtype=jnp.bfloat16) -> dict[str, Any]:
        k1, k2, k3 = jax.random.split(rng, 3)
        params = super().init_params(k1, dtype)
        H, Hv = self.cfg.hidden_size, self.vision.hidden
        params["vision"] = self.vision.init_params(k2, dtype)
        params["projector"] = {
            "w": (jax.random.normal(k3, (Hv, H)) / np.sqrt(Hv)).astype(dtype),
            "norm": jnp.zeros((Hv,), dtype),  # gemma (1+w) rms convention
        }
        return params

    def param_specs(self, tp_axis: str = "tp") -> dict[str, Any]:
        specs = super().param_specs(tp_axis)
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.init_params(jax.random.PRNGKey(0)),
            is_leaf=lambda x: isinstance(x, jax.Array),
        )
        specs["projector"] = {"w": P(), "norm": P()}
        return specs

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.bfloat16):
        lang, vision, proj = {}, {}, {}
        for name, w in state.items():
            if name.startswith("model.language_model."):
                lang["model." + name[len("model.language_model.") :]] = w
            elif name.startswith("language_model.model."):  # older layout
                lang["model." + name[len("language_model.model.") :]] = w
            elif ".vision_tower.vision_model." in name:
                sub = name.split(".vision_tower.vision_model.", 1)[1]
                if sub.startswith("head."):
                    continue  # SigLIP pooling head: unused by Gemma3
                vision[sub] = w
            elif ".multi_modal_projector." in name:
                proj[name.split(".multi_modal_projector.", 1)[1]] = w
            elif name in ("lm_head.weight", "language_model.lm_head.weight"):
                pass  # gemma ties embeddings
            else:
                raise KeyError(f"unmapped VLM weight {name}")
        params = super().convert_hf_state(lang, dtype)
        params["vision"] = self.vision.convert_hf_state(vision, dtype)
        params["projector"] = jax.tree.map(
            lambda x: jnp.asarray(x, dtype),
            {
                "w": proj["mm_input_projection_weight"],  # [Hv, H] already
                "norm": proj["mm_soft_emb_norm.weight"],
            },
        )
        return params

    # ---------------------------------------------------------------- vision

    def encode_images(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """[N, C, S, S] -> pooled projected features [N, mm_tokens, H]."""
        feats = self.vision(params["vision"], pixel_values)  # [N, P, Hv]
        N, Pn, Hv = feats.shape
        ppi, k, tps = (
            self.vision.image_size // self.vision.patch,
            self.pool_kernel,
            self.tokens_per_side,
        )
        # avg-pool the patch grid down to tokens_per_side^2 soft tokens
        g = feats.reshape(N, tps, k, tps, k, Hv)
        pooled = jnp.mean(g, axis=(2, 4)).reshape(N, tps * tps, Hv)
        normed = gemma_rms_norm(
            pooled, params["projector"]["norm"], self.vision.eps
        )
        return normed @ params["projector"]["w"]
