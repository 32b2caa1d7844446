"""Mllama (Llama-3.2 Vision): gated two-stage ViT + cross-attention decoder.

Counterpart of the reference's largest vision model
(reference: scratchpad/nn/models/mllama.py, 1,028 LoC). TPU-native shape of
the rebuild:

- **static-shape multi-tile resolution**: HF tiles images by aspect ratio
  with dynamic shapes; here the tile stack is always zero-padded to
  max_num_tiles (multimodal/image.py preprocess_tiled picks the HF
  aspect-ratio canvas), so the vision step compiles ONCE while matching
  HF's dynamic tiling bit-for-bit — pad tiles are masked in the vision
  transformers ((pad q, pad k)-pair rule) and in cross attention
  (ForwardMeta.cross_lens).
- the vision tower runs as its own jitted step producing cross-attention
  states [S_img, H_text]; the decoder caches per-layer cross K/V in
  per-request SLOTS of a dedicated buffer (``KVCache.cross``) written once
  at prefill and read every decode step — the paged-KV analogue for
  cross attention, which has no causal growth.
- the prompt keeps ONE placeholder row per image whose embedding is the
  model's learned <|image|> embedding; the row id is content-hashed so the
  radix cache never aliases different images (text KV depends on the image
  through cross attention).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
from scratchpad_tpu.memory.kv_cache import KVCache
from scratchpad_tpu.models.common import rms_norm, silu_mul, apply_rope
from scratchpad_tpu.models.llama import LlamaForCausalLM

_NEG = jnp.float32(-1e30)


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (
        (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
        + b.astype(jnp.float32)
    ).astype(x.dtype)


class MllamaVisionTower:
    """HF MllamaVisionModel at static max_num_tiles tile stacks."""

    def __init__(self, vcfg: dict):
        self.hv = vcfg["hidden_size"]
        self.heads = vcfg.get("attention_heads", 16)
        self.layers = vcfg["num_hidden_layers"]
        self.global_layers = vcfg.get("num_global_layers", 8)
        self.image_size = vcfg["image_size"]
        self.patch = vcfg["patch_size"]
        self.channels = vcfg.get("num_channels", 3)
        self.inter = vcfg.get("intermediate_size", 4 * self.hv)
        self.max_tiles = vcfg.get("max_num_tiles", 4)
        self.inter_idx = list(
            vcfg.get("intermediate_layers_indices", [self.layers - 1])
        )
        sup = vcfg.get("supported_aspect_ratios") or [[1, 1]]
        self.supported_aspect_ratios = [tuple(a) for a in sup]
        self.max_ar_id = len(sup)
        self.grid = self.image_size // self.patch
        self.num_patches = self.grid * self.grid + 1
        self.out_dim = self.hv * (1 + len(self.inter_idx))

    def init_params(self, rng: jax.Array, dtype=jnp.float32) -> dict[str, Any]:
        Hv, I, P0 = self.hv, self.inter, self.num_patches
        T, AR = self.max_tiles, self.max_ar_id
        D = self.channels * self.patch * self.patch
        k = iter(jax.random.split(rng, 24))

        def init(key, shape, scale):
            return (
                jax.random.normal(key, shape, jnp.float32) / np.sqrt(scale)
            ).astype(dtype)

        def enc(n):
            return {
                "ln1_w": jnp.ones((n, Hv), dtype),
                "ln1_b": jnp.zeros((n, Hv), dtype),
                "ln2_w": jnp.ones((n, Hv), dtype),
                "ln2_b": jnp.zeros((n, Hv), dtype),
                "wq": init(next(k), (n, Hv, Hv), Hv),
                "wk": init(next(k), (n, Hv, Hv), Hv),
                "wv": init(next(k), (n, Hv, Hv), Hv),
                "wo": init(next(k), (n, Hv, Hv), Hv),
                "fc1": init(next(k), (n, Hv, I), Hv),
                "fc1_b": jnp.zeros((n, I), dtype),
                "fc2": init(next(k), (n, I, Hv), I),
                "fc2_b": jnp.zeros((n, Hv), dtype),
            }

        g = enc(self.global_layers)
        g["gate_attn"] = jnp.zeros((self.global_layers, 1), dtype)
        g["gate_ffn"] = jnp.zeros((self.global_layers, 1), dtype)
        return {
            "patch_w": init(next(k), (D, Hv), D),
            "class_emb": init(next(k), (Hv,), Hv),
            "pos_gate": jnp.zeros((1,), dtype),
            "pos_emb": init(next(k), (P0, Hv), Hv),
            "tile_pos_emb": init(next(k), (AR + 1, T * P0 * Hv), Hv),
            "pre_tile_emb": init(next(k), (AR + 1, T * Hv), Hv),
            "pre_tile_gate": jnp.zeros((1,), dtype),
            "post_tile_emb": init(next(k), (AR + 1, T * Hv), Hv),
            "post_tile_gate": jnp.zeros((1,), dtype),
            "ln_pre_w": jnp.ones((Hv,), dtype),
            "ln_pre_b": jnp.zeros((Hv,), dtype),
            "ln_post_w": jnp.ones((Hv,), dtype),
            "ln_post_b": jnp.zeros((Hv,), dtype),
            "local": enc(self.layers),
            "global": g,
        }

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.float32):
        """Map ``vision_model.*`` tensors (prefix stripped)."""
        out: dict[str, Any] = {"local": {}, "global": {}}
        lmap = {
            "input_layernorm.weight": ("ln1_w", False),
            "input_layernorm.bias": ("ln1_b", False),
            "post_attention_layernorm.weight": ("ln2_w", False),
            "post_attention_layernorm.bias": ("ln2_b", False),
            "self_attn.q_proj.weight": ("wq", True),
            "self_attn.k_proj.weight": ("wk", True),
            "self_attn.v_proj.weight": ("wv", True),
            "self_attn.o_proj.weight": ("wo", True),
            "mlp.fc1.weight": ("fc1", True),
            "mlp.fc1.bias": ("fc1_b", False),
            "mlp.fc2.weight": ("fc2", True),
            "mlp.fc2.bias": ("fc2_b", False),
            "gate_attn": ("gate_attn", False),
            "gate_ffn": ("gate_ffn", False),
        }
        stacks: dict[tuple, dict[str, list]] = {"local": {}, "global": {}}
        n_by = {"local": self.layers, "global": self.global_layers}
        top = {
            "class_embedding": "class_emb",
            "gated_positional_embedding.gate": "pos_gate",
            "gated_positional_embedding.embedding": "pos_emb",
            "gated_positional_embedding.tile_embedding.weight": "tile_pos_emb",
            "pre_tile_positional_embedding.gate": "pre_tile_gate",
            "pre_tile_positional_embedding.embedding.weight": "pre_tile_emb",
            "post_tile_positional_embedding.gate": "post_tile_gate",
            "post_tile_positional_embedding.embedding.weight": "post_tile_emb",
            "layernorm_pre.weight": "ln_pre_w",
            "layernorm_pre.bias": "ln_pre_b",
            "layernorm_post.weight": "ln_post_w",
            "layernorm_post.bias": "ln_post_b",
        }
        for name, w in state.items():
            if name == "patch_embedding.weight":
                out["patch_w"] = w.reshape(w.shape[0], -1).T
            elif name in top:
                out[top[name]] = w
            elif name.startswith("transformer.layers.") or name.startswith(
                "global_transformer.layers."
            ):
                which = "local" if name.startswith("transformer.") else "global"
                rest = name.split(".layers.", 1)[1]
                l_s, sub = rest.split(".", 1)
                tgt, transpose = lmap[sub]
                stacks[which].setdefault(tgt, [None] * n_by[which])[int(l_s)] = (
                    w.T if transpose else w
                )
            else:
                raise KeyError(f"unmapped mllama vision weight {name}")
        for which in ("local", "global"):
            out[which] = {k: np.stack(v) for k, v in stacks[which].items()}
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), out)

    def __call__(
        self, params: dict, px: jax.Array, ar_ids=None, n_tiles=None
    ) -> jax.Array:
        """Tiled images -> per-patch features.

        px: [N, T, C, S, S] (T = max_num_tiles, zero-padded) or the legacy
        single-tile [N, C, S, S]. ar_ids i32[N] index the config's
        supported_aspect_ratios table 1-based (HF convention; defaults to
        1 = the first entry, usually 1x1); n_tiles i32[N] counts the live
        tiles per image. Returns [N, T*num_patches, out_dim] for tiled
        input ([N, num_patches, out_dim] legacy) — all tiles attend
        JOINTLY in both transformers like HF MllamaVisionModel, and padded
        tiles are masked with the same (pad q, pad k)-pair rule as the
        patch padding."""
        single = px.ndim == 4
        if single:
            px = px[:, None]
        N, T = px.shape[0], px.shape[1]
        Hv, p, g = self.hv, self.patch, self.grid
        C = self.channels
        heads, hd = self.heads, Hv // self.heads
        scale = hd**-0.5
        if ar_ids is None:
            ar_ids = jnp.ones((N,), jnp.int32)
        if n_tiles is None:
            n_tiles = jnp.full((N,), T, jnp.int32)
        ar_ids = jnp.asarray(ar_ids, jnp.int32)
        n_tiles = jnp.asarray(n_tiles, jnp.int32)
        Tm = self.max_tiles

        # conv patch embed == row-major patch extraction @ flattened kernel
        x = px.reshape(N, T, C, g, p, g, p).transpose(0, 1, 3, 5, 2, 4, 6)
        x = x.reshape(N, T, g * g, C * p * p).astype(params["patch_w"].dtype)
        x = x @ params["patch_w"]  # [N, T, P0-1, Hv]

        # gated pre-tile embedding, per (aspect ratio, tile)
        pre = params["pre_tile_emb"][ar_ids].reshape(N, Tm, 1, Hv)[:, :T]
        x = x + pre * jnp.tanh(params["pre_tile_gate"])

        cls = jnp.broadcast_to(params["class_emb"], (N, T, 1, Hv))
        x = jnp.concatenate([cls, x], axis=2)  # [N, T, P0, Hv]
        P0 = self.num_patches

        gate = jnp.tanh(params["pos_gate"])
        x = x + (1 - gate) * params["pos_emb"]
        tile_pos = params["tile_pos_emb"][ar_ids].reshape(N, Tm, P0, Hv)[:, :T]
        x = x + gate * tile_pos

        x = _ln(x, params["ln_pre_w"], params["ln_pre_b"])

        pad = (8 - P0 % 8) % 8
        Pp = P0 + pad
        x = jnp.pad(x, [(0, 0), (0, 0), (0, pad), (0, 0)])
        L = T * Pp
        x = x.reshape(N, L, Hv)
        # HF masks only (pad q, pad k) pairs — valid queries DO attend the
        # zero rows (modeling_mllama._prepare_aspect_ratio_attention_mask);
        # a padded TILE's patches count as padding wholesale
        patch_pad = jnp.arange(Pp) >= P0  # [Pp]
        tile_pad = (
            jnp.arange(T)[None, :] >= n_tiles[:, None]
        )  # [N, T]
        inv = (
            tile_pad[:, :, None] | patch_pad[None, None, :]
        ).reshape(N, L).astype(jnp.float32)
        bias = inv[:, :, None] * inv[:, None, :] * _NEG  # [N, L, L]

        def enc_layer(h, lp, gated):
            y = _ln(h, lp["ln1_w"], lp["ln1_b"])
            q = (y @ lp["wq"]).reshape(N, L, heads, hd)
            kk = (y @ lp["wk"]).reshape(N, L, heads, hd)
            v = (y @ lp["wv"]).reshape(N, L, heads, hd)
            s = (
                jnp.einsum("nqhd,nkhd->nhqk", q, kk).astype(jnp.float32)
                * scale
                + bias[:, None]
            )
            a = jax.nn.softmax(s, axis=-1).astype(h.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", a, v).reshape(N, L, Hv)
            o = o @ lp["wo"]
            if gated:
                o = o * jnp.tanh(lp["gate_attn"])
            h = h + o
            y = _ln(h, lp["ln2_w"], lp["ln2_b"])
            m = (
                jax.nn.gelu(y @ lp["fc1"] + lp["fc1_b"], approximate=False)
                @ lp["fc2"]
                + lp["fc2_b"]
            )
            if gated:
                m = m * jnp.tanh(lp["gate_ffn"])
            return h + m

        inters = []
        for li in range(self.layers):
            lp = jax.tree.map(lambda a: a[li], params["local"])
            x = enc_layer(x, lp, gated=False)
            if li in self.inter_idx:
                inters.append(x)

        x = _ln(x, params["ln_post_w"], params["ln_post_b"])
        post = params["post_tile_emb"][ar_ids].reshape(N, Tm, 1, Hv)[:, :T]
        x = (x.reshape(N, T, Pp, Hv) + post * jnp.tanh(
            params["post_tile_gate"]
        )).reshape(N, L, Hv)

        for li in range(self.global_layers):
            lp = jax.tree.map(lambda a: a[li], params["global"])
            x = enc_layer(x, lp, gated=True)

        def unpad(h):
            return h.reshape(N, T, Pp, -1)[:, :, :P0].reshape(N, T * P0, -1)

        x = unpad(x)
        # HF stacks intermediates on a trailing axis then flattens, so the
        # feature order interleaves (dim, layer) — not a plain concat
        inter = jnp.stack([unpad(h) for h in inters], axis=-1)
        inter = inter.reshape(N, T * P0, -1)
        out = jnp.concatenate([x, inter], axis=-1)  # [N, T*P0, out_dim]
        if single:
            return out
        return out


class MllamaForCausalLM(LlamaForCausalLM):
    """Llama decoder with interleaved cross-attention layers.

    ``num_hidden_layers`` counts BOTH kinds (HF convention); the paged KV
    cache covers self layers only (``num_kv_layers``) and cross K/V live in
    ``KVCache.cross`` slots. The prompt's image placeholder row carries the
    learned <|image|> embedding via the generic input_embeds path with a
    content-hashed id (radix-safe)."""

    is_multimodal = True
    has_cross_attention = True
    supports_pallas_attention = True

    def __init__(self, cfg: ModelConfig):
        self.cross_idx = sorted(cfg.cross_attention_layers or [])
        assert self.cross_idx, "Mllama config needs cross_attention_layers"
        total = cfg.num_hidden_layers
        self_idx = [i for i in range(total) if i not in self.cross_idx]
        self.num_kv_layers = len(self_idx)
        self._total_layers = total
        # segments of consecutive SELF layers, each optionally followed by
        # one cross layer: [(n_self, cross_pos_or_None), ...]
        self.segments: list[tuple[int, Optional[int]]] = []
        run = 0
        ci = 0
        for i in range(total):
            if ci < len(self.cross_idx) and i == self.cross_idx[ci]:
                self.segments.append((run, ci))
                run = 0
                ci += 1
            else:
                run += 1
        if run:
            self.segments.append((run, None))

        # build the base model with the SELF-layer count (stacked arrays)
        import copy

        inner = copy.copy(cfg)
        inner.num_hidden_layers = self.num_kv_layers
        super().__init__(inner)
        self.cfg_total = cfg
        mm = cfg.multimodal or {}
        assert "vision_config" in mm, "Mllama config needs multimodal.vision_config"
        self.image_token_index = mm.get("image_token_index", 128256)
        self.vision = MllamaVisionTower(mm["vision_config"])
        self.num_image_tokens = 1  # ONE placeholder row per image

    # ------------------------------------------------------------ parameters

    def init_params(self, rng: jax.Array, dtype=jnp.bfloat16) -> dict[str, Any]:
        cfg = self.cfg
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        params = super().init_params(k1, dtype)
        H, D = cfg.hidden_size, cfg.head_dim
        Hq, Hkv = cfg.num_attention_heads, cfg.num_kv_heads
        I, Lx = cfg.intermediate_size, len(self.cross_idx)
        V = cfg.vocab_size

        def init(key, shape, scale):
            return (
                jax.random.normal(key, shape, jnp.float32) / np.sqrt(scale)
            ).astype(dtype)

        # HF reserves 8 extra embedding rows (<|image|> etc.)
        params["embed"] = init(k2, (V + 8, H), H)
        ks = iter(jax.random.split(k3, 8))
        params["cross_layers"] = {
            "input_norm": jnp.ones((Lx, H), dtype),
            "post_norm": jnp.ones((Lx, H), dtype),
            "q_norm": jnp.ones((Lx, D), dtype),
            "k_norm": jnp.ones((Lx, D), dtype),
            "wq": init(next(ks), (Lx, H, Hq * D), H),
            "wk": init(next(ks), (Lx, H, Hkv * D), H),
            "wv": init(next(ks), (Lx, H, Hkv * D), H),
            "wo": init(next(ks), (Lx, Hq * D, H), Hq * D),
            "gate": init(next(ks), (Lx, H, I), H),
            "up": init(next(ks), (Lx, H, I), H),
            "down": init(next(ks), (Lx, I, H), I),
            "gate_attn": jnp.zeros((Lx, 1), dtype),
            "gate_ffn": jnp.zeros((Lx, 1), dtype),
        }
        params["vision"] = self.vision.init_params(k4, dtype)
        Hv_out = self.vision.out_dim
        params["projector"] = {
            "w": init(next(ks), (Hv_out, H), Hv_out),
            "b": jnp.zeros((H,), dtype),
        }
        return params

    def param_specs(self, tp_axis: str = "tp") -> dict[str, Any]:
        t = tp_axis
        specs = super().param_specs(tp_axis)
        specs["cross_layers"] = {
            "input_norm": P(None, None),
            "post_norm": P(None, None),
            "q_norm": P(None, None),
            "k_norm": P(None, None),
            "wq": P(None, None, t),
            "wk": P(None, None, t),
            "wv": P(None, None, t),
            "wo": P(None, t, None),
            "gate": P(None, None, t),
            "up": P(None, None, t),
            "down": P(None, t, None),
            "gate_attn": P(None, None),
            "gate_ffn": P(None, None),
        }
        specs["vision"] = jax.tree.map(
            lambda _: P(),
            self.vision.init_params(jax.random.PRNGKey(0)),
            is_leaf=lambda x: isinstance(x, jax.Array),
        )
        specs["projector"] = {"w": P(), "b": P()}
        return specs

    CROSS_MAP = {
        "cross_attn.q_proj.weight": ("wq", True),
        "cross_attn.k_proj.weight": ("wk", True),
        "cross_attn.v_proj.weight": ("wv", True),
        "cross_attn.o_proj.weight": ("wo", True),
        "cross_attn.q_norm.weight": ("q_norm", False),
        "cross_attn.k_norm.weight": ("k_norm", False),
        "cross_attn_attn_gate": ("gate_attn", False),
        "cross_attn_mlp_gate": ("gate_ffn", False),
        "mlp.gate_proj.weight": ("gate", True),
        "mlp.up_proj.weight": ("up", True),
        "mlp.down_proj.weight": ("down", True),
        "input_layernorm.weight": ("input_norm", False),
        "post_attention_layernorm.weight": ("post_norm", False),
    }

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.bfloat16):
        lang, vision, cross = {}, {}, {}
        proj_w = proj_b = None
        self_remap = {
            old: new
            for new, old in enumerate(
                i for i in range(self._total_layers) if i not in self.cross_idx
            )
        }
        cross_remap = {old: ci for ci, old in enumerate(self.cross_idx)}
        Lx = len(self.cross_idx)
        cross_stacks: dict[str, list] = {}
        for name, w in state.items():
            n = name
            if n.startswith("model.vision_model."):
                vision[n[len("model.vision_model.") :]] = w
                continue
            if n.startswith("vision_model."):
                vision[n[len("vision_model.") :]] = w
                continue
            if n == "model.multi_modal_projector.weight" or n == "multi_modal_projector.weight":
                proj_w = w.T
                continue
            if n == "model.multi_modal_projector.bias" or n == "multi_modal_projector.bias":
                proj_b = w
                continue
            if n.startswith("model.language_model."):
                n = "model." + n[len("model.language_model.") :]
            elif n.startswith("language_model.model."):
                n = "model." + n[len("language_model.model.") :]
            elif n.startswith("language_model."):
                n = n[len("language_model.") :]
            if n.startswith("model.layers."):
                rest = n[len("model.layers.") :]
                idx_s, sub = rest.split(".", 1)
                idx = int(idx_s)
                if idx in cross_remap:
                    tgt, transpose = self.CROSS_MAP[sub]
                    cross_stacks.setdefault(tgt, [None] * Lx)[
                        cross_remap[idx]
                    ] = (w.T if transpose else w)
                else:
                    lang[f"model.layers.{self_remap[idx]}.{sub}"] = w
            else:
                lang[n] = w
        params = super().convert_hf_state(lang, dtype)
        params["cross_layers"] = jax.tree.map(
            lambda x: jnp.asarray(x, dtype),
            {
                k: np.stack(
                    [x.reshape(1) if x.ndim == 0 else x for x in v]
                )
                for k, v in cross_stacks.items()
            },
        )
        params["vision"] = self.vision.convert_hf_state(vision, dtype)
        params["projector"] = {
            "w": jnp.asarray(proj_w, dtype),
            "b": jnp.asarray(proj_b, dtype),
        }
        return params

    # ---------------------------------------------------------------- vision

    def encode_images(
        self, params: dict, pixel_values: jax.Array, ar_ids=None, n_tiles=None
    ) -> jax.Array:
        """[N, C, S, S] or tiled [N, T, C, S, S] -> projected cross states
        [N, S_img, H_text] (S_img = tiles x patches for tiled input)."""
        feats = self.vision(params["vision"], pixel_values, ar_ids, n_tiles)
        pr = params["projector"]
        return feats @ pr["w"] + pr["b"]

    # --------------------------------------------------------------- forward

    def _cross_layer(self, params, ci, x, cross_buf, meta):
        cfg = self.cfg
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        T = meta.num_tokens
        cp = jax.tree.map(lambda a: a[ci], params["cross_layers"])
        eps = cfg.rms_norm_eps

        slots = (
            meta.cross_slots
            if meta.cross_slots is not None
            else jnp.zeros(meta.batch_size, jnp.int32)
        )
        has_img = (slots > 0).astype(jnp.float32)  # [B]

        xn = rms_norm(x, cp["input_norm"], eps)
        q = (xn @ cp["wq"]).reshape(T, Hq, D)
        q = rms_norm(q, cp["q_norm"], eps)

        kv_b = cross_buf[slots, ci]  # [B, S, 2Hkv, D]
        k = kv_b[:, :, 0::2, :]
        v = kv_b[:, :, 1::2, :]
        G = Hq // Hkv
        qr = q.reshape(T, Hkv, G, D)
        # per-token batch gather: each token attends its request's image
        kt = k[meta.req_indices]  # [T, S, Hkv, D]
        vt = v[meta.req_indices]
        s = (
            jnp.einsum("thgd,tshd->thgs", qr.astype(jnp.float32),
                       kt.astype(jnp.float32))
            * (D**-0.5)
        )
        if meta.cross_lens is not None:
            # tiled images: only n_tiles * patches cross rows are live
            # (HF masks pad tiles via cross_attention_mask)
            cl = meta.cross_lens[meta.req_indices]  # [T]
            pos = jnp.arange(kt.shape[1], dtype=jnp.int32)
            s = jnp.where(
                pos[None, None, None, :] < cl[:, None, None, None], s, -1e30
            )
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("thgs,tshd->thgd", a, vt.astype(jnp.float32))
        o = o.reshape(T, Hq * D).astype(x.dtype) @ cp["wo"]
        row_mask = has_img[meta.req_indices][:, None].astype(x.dtype)  # [T,1]
        x = x + jnp.tanh(cp["gate_attn"]) * o * row_mask
        h2 = rms_norm(x, cp["post_norm"], eps)
        m = silu_mul(h2 @ cp["gate"], h2 @ cp["up"]) @ cp["down"]
        x = x + jnp.tanh(cp["gate_ffn"]) * m * row_mask
        return x

    def _write_cross(self, params, cross_buf, meta):
        """Project prefill vision states into every cross layer's K/V slot."""
        cfg = self.cfg
        Hkv, D = cfg.num_kv_heads, cfg.head_dim
        B, S, H = meta.cross_states.shape
        cs = meta.cross_states.astype(cross_buf.dtype)
        slots = meta.cross_slots
        for ci in range(len(self.cross_idx)):
            cp = jax.tree.map(lambda a: a[ci], params["cross_layers"])
            k = (cs @ cp["wk"]).reshape(B, S, Hkv, D)
            k = rms_norm(k, cp["k_norm"], cfg.rms_norm_eps)
            v = (cs @ cp["wv"]).reshape(B, S, Hkv, D)
            kvint = jnp.stack([k, v], axis=3).reshape(B, S, 2 * Hkv, D)
            cross_buf = cross_buf.at[slots, ci].set(kvint.astype(cross_buf.dtype))
        return cross_buf

    def __call__(
        self, params: dict, kv: KVCache, meta: ForwardMeta
    ) -> tuple[KVCache, jax.Array]:
        x = self.embed_tokens(params, meta)
        cross_buf = kv.cross
        if meta.cross_states is not None and meta.cross_slots is not None:
            cross_buf = self._write_cross(params, cross_buf, meta)
        kv_c = kv
        start = 0
        for n_self, ci in self.segments:
            if n_self:
                stack = jax.tree.map(
                    lambda a: a[start : start + n_self], params["layers"]
                )
                ids = jnp.arange(start, start + n_self, dtype=jnp.int32)
                x, kv_c = self.layers_forward(params, stack, ids, x, kv_c, meta)
                start += n_self
            if ci is not None:
                x = self._cross_layer(params, ci, x, cross_buf, meta)
        import dataclasses as _dc

        kv_out = _dc.replace(kv_c, cross=cross_buf)
        return kv_out, self.finish(params, x, meta)
