"""CLIP-style vision tower for multimodal models.

Counterpart of the reference's vision encoders + vision attention
(reference: scratchpad/nn/attention/vision.py, and the vision halves of
scratchpad/nn/models/mllama.py / qwen2_vl). TPU shape of the computation:
images arrive as a fixed [N, 3, S, S] batch, the encoder is a plain
bidirectional transformer scanned over layers — everything static-shaped,
one jit per image-count bucket, MXU-friendly (patch conv = one big matmul).

Conventions follow HF ``CLIPVisionModel``: patch conv (no bias), learned
class + position embeddings, pre-layernorm, encoder layers with
quick-gelu MLPs, and feature extraction at ``vision_feature_layer`` (e.g.
-2 = run all but the last layer, no post-layernorm).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPVisionTower:
    def __init__(self, vcfg: dict, feature_layer: int = -2,
                 select: str = "default"):
        self.hidden = vcfg["hidden_size"]
        self.inter = vcfg["intermediate_size"]
        self.layers = vcfg["num_hidden_layers"]
        self.heads = vcfg["num_attention_heads"]
        self.image_size = vcfg["image_size"]
        self.patch = vcfg["patch_size"]
        self.eps = vcfg.get("layer_norm_eps", 1e-5)
        self.channels = vcfg.get("num_channels", 3)
        # feature_layer -k => run layers[:L-k+1] and return that hidden state
        self.n_run = (
            self.layers + feature_layer + 1 if feature_layer < 0 else feature_layer
        )
        assert 0 < self.n_run <= self.layers
        self.select = select

    @property
    def num_patches(self) -> int:
        n = (self.image_size // self.patch) ** 2
        return n if self.select == "default" else n + 1

    def init_params(self, rng: jax.Array, dtype=jnp.float32) -> dict[str, Any]:
        Hv, I, L = self.hidden, self.inter, self.layers
        P = (self.image_size // self.patch) ** 2
        D = self.patch * self.patch * self.channels
        k = jax.random.split(rng, 8)

        def init(key, shape, scale):
            return (
                jax.random.normal(key, shape, jnp.float32) / np.sqrt(scale)
            ).astype(dtype)

        return {
            "patch_w": init(k[0], (D, Hv), D),  # flattened conv kernel
            "class_emb": init(k[1], (Hv,), Hv),
            "pos_emb": init(k[2], (P + 1, Hv), Hv),
            "pre_ln": {"w": jnp.ones((Hv,), dtype), "b": jnp.zeros((Hv,), dtype)},
            "layers": {
                "ln1_w": jnp.ones((L, Hv), dtype),
                "ln1_b": jnp.zeros((L, Hv), dtype),
                "ln2_w": jnp.ones((L, Hv), dtype),
                "ln2_b": jnp.zeros((L, Hv), dtype),
                "wq": init(k[3], (L, Hv, Hv), Hv),
                "bq": jnp.zeros((L, Hv), dtype),
                "wk": init(k[4], (L, Hv, Hv), Hv),
                "bk": jnp.zeros((L, Hv), dtype),
                "wv": init(k[5], (L, Hv, Hv), Hv),
                "bv": jnp.zeros((L, Hv), dtype),
                "wo": init(k[6], (L, Hv, Hv), Hv),
                "bo": jnp.zeros((L, Hv), dtype),
                "fc1": init(k[7], (L, Hv, I), Hv),
                "fc1_b": jnp.zeros((L, I), dtype),
                "fc2": init(k[0], (L, I, Hv), I),
                "fc2_b": jnp.zeros((L, Hv), dtype),
            },
        }

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.float32):
        """Map ``vision_model.*`` tensors (prefix already stripped)."""
        L = self.layers
        layers: dict[str, list] = {}
        out: dict[str, Any] = {}
        lmap = {
            "layer_norm1.weight": "ln1_w", "layer_norm1.bias": "ln1_b",
            "layer_norm2.weight": "ln2_w", "layer_norm2.bias": "ln2_b",
            "self_attn.q_proj.weight": "wq", "self_attn.q_proj.bias": "bq",
            "self_attn.k_proj.weight": "wk", "self_attn.k_proj.bias": "bk",
            "self_attn.v_proj.weight": "wv", "self_attn.v_proj.bias": "bv",
            "self_attn.out_proj.weight": "wo", "self_attn.out_proj.bias": "bo",
            "mlp.fc1.weight": "fc1", "mlp.fc1.bias": "fc1_b",
            "mlp.fc2.weight": "fc2", "mlp.fc2.bias": "fc2_b",
        }
        for name, w in state.items():
            if name.startswith("encoder.layers."):
                rest = name[len("encoder.layers.") :]
                l_s, sub = rest.split(".", 1)
                tgt = lmap[sub]
                wv = w.T if sub.endswith("weight") else w
                layers.setdefault(tgt, [None] * L)[int(l_s)] = wv
            elif name == "embeddings.patch_embedding.weight":
                # conv [Hv, C, p, p] -> flattened [C*p*p, Hv] matching our
                # patch extraction order (C, ph, pw)
                out["patch_w"] = w.reshape(w.shape[0], -1).T
            elif name == "embeddings.class_embedding":
                out["class_emb"] = w
            elif name == "embeddings.position_embedding.weight":
                out["pos_emb"] = w
            elif name == "pre_layrnorm.weight":  # (sic) HF CLIP typo
                out.setdefault("pre_ln", {})["w"] = w
            elif name == "pre_layrnorm.bias":
                out.setdefault("pre_ln", {})["b"] = w
            elif name in (
                "post_layernorm.weight",
                "post_layernorm.bias",
                "embeddings.position_ids",
            ):
                pass  # feature layer -2 never reaches post_layernorm
            else:
                raise KeyError(f"unmapped vision weight {name}")
        out["layers"] = {k: np.stack(v) for k, v in layers.items()}
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), out)

    def __call__(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """[N, C, S, S] -> hidden at the feature layer [N, P(+1), Hv]."""

        def ln(x, p):
            m = jnp.mean(x, axis=-1, keepdims=True)
            v = jnp.var(x, axis=-1, keepdims=True)
            return (x - m) * jax.lax.rsqrt(v + self.eps) * p["w"] + p["b"]

        N = pixel_values.shape[0]
        p, C, Hv = self.patch, self.channels, self.hidden
        grid = self.image_size // p
        # extract patches: [N, C, g, p, g, p] -> [N, g*g, C*p*p]
        x = pixel_values.reshape(N, C, grid, p, grid, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, grid * grid, C * p * p)
        x = x.astype(params["patch_w"].dtype) @ params["patch_w"]
        cls = jnp.broadcast_to(params["class_emb"], (N, 1, Hv))
        x = jnp.concatenate([cls, x], axis=1) + params["pos_emb"]
        x = ln(x, params["pre_ln"])

        heads = self.heads
        hd = Hv // heads
        scale = hd**-0.5
        P1 = x.shape[1]

        def body(h, lp):
            y = ln(h, {"w": lp["ln1_w"], "b": lp["ln1_b"]})
            q = (y @ lp["wq"] + lp["bq"]).reshape(N, P1, heads, hd)
            k = (y @ lp["wk"] + lp["bk"]).reshape(N, P1, heads, hd)
            v = (y @ lp["wv"] + lp["bv"]).reshape(N, P1, heads, hd)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k).astype(jnp.float32) * scale
            a = jax.nn.softmax(s, axis=-1).astype(h.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", a, v).reshape(N, P1, Hv)
            h = h + (o @ lp["wo"] + lp["bo"])
            y = ln(h, {"w": lp["ln2_w"], "b": lp["ln2_b"]})
            h = h + (
                quick_gelu(y @ lp["fc1"] + lp["fc1_b"]) @ lp["fc2"]
                + lp["fc2_b"]
            )
            return h, None

        run = jax.tree.map(lambda a: a[: self.n_run], params["layers"])
        x, _ = jax.lax.scan(body, x, run)
        if self.select == "default":
            x = x[:, 1:]  # drop CLS
        return x

class SigLIPVisionTower:
    """SigLIP vision encoder (Gemma-3 multimodal tower).

    Differences from CLIP (HF SiglipVisionModel; reference serves it inside
    scratchpad/nn/models/gemma/gemma3_mm.py:86): no class token, no
    pre-layernorm, gelu_pytorch_tanh MLPs, and the FINAL hidden state goes
    through post_layernorm (no feature-layer selection)."""

    def __init__(self, vcfg: dict):
        self.hidden = vcfg["hidden_size"]
        self.inter = vcfg["intermediate_size"]
        self.layers = vcfg["num_hidden_layers"]
        self.heads = vcfg["num_attention_heads"]
        self.image_size = vcfg["image_size"]
        self.patch = vcfg["patch_size"]
        self.eps = vcfg.get("layer_norm_eps", 1e-6)
        self.channels = vcfg.get("num_channels", 3)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch) ** 2

    def init_params(self, rng: jax.Array, dtype=jnp.float32) -> dict[str, Any]:
        Hv, I, L = self.hidden, self.inter, self.layers
        Pn = self.num_patches
        D = self.patch * self.patch * self.channels
        k = jax.random.split(rng, 8)

        def init(key, shape, scale):
            return (
                jax.random.normal(key, shape, jnp.float32) / np.sqrt(scale)
            ).astype(dtype)

        return {
            "patch_w": init(k[0], (D, Hv), D),
            "patch_b": jnp.zeros((Hv,), dtype),
            "pos_emb": init(k[1], (Pn, Hv), Hv),
            "post_ln": {"w": jnp.ones((Hv,), dtype), "b": jnp.zeros((Hv,), dtype)},
            "layers": {
                "ln1_w": jnp.ones((L, Hv), dtype),
                "ln1_b": jnp.zeros((L, Hv), dtype),
                "ln2_w": jnp.ones((L, Hv), dtype),
                "ln2_b": jnp.zeros((L, Hv), dtype),
                "wq": init(k[2], (L, Hv, Hv), Hv),
                "bq": jnp.zeros((L, Hv), dtype),
                "wk": init(k[3], (L, Hv, Hv), Hv),
                "bk": jnp.zeros((L, Hv), dtype),
                "wv": init(k[4], (L, Hv, Hv), Hv),
                "bv": jnp.zeros((L, Hv), dtype),
                "wo": init(k[5], (L, Hv, Hv), Hv),
                "bo": jnp.zeros((L, Hv), dtype),
                "fc1": init(k[6], (L, Hv, I), Hv),
                "fc1_b": jnp.zeros((L, I), dtype),
                "fc2": init(k[7], (L, I, Hv), I),
                "fc2_b": jnp.zeros((L, Hv), dtype),
            },
        }

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.float32):
        """Map ``vision_model.*`` tensors (prefix already stripped)."""
        L = self.layers
        layers: dict[str, list] = {}
        out: dict[str, Any] = {}
        lmap = {
            "layer_norm1.weight": "ln1_w", "layer_norm1.bias": "ln1_b",
            "layer_norm2.weight": "ln2_w", "layer_norm2.bias": "ln2_b",
            "self_attn.q_proj.weight": "wq", "self_attn.q_proj.bias": "bq",
            "self_attn.k_proj.weight": "wk", "self_attn.k_proj.bias": "bk",
            "self_attn.v_proj.weight": "wv", "self_attn.v_proj.bias": "bv",
            "self_attn.out_proj.weight": "wo", "self_attn.out_proj.bias": "bo",
            "mlp.fc1.weight": "fc1", "mlp.fc1.bias": "fc1_b",
            "mlp.fc2.weight": "fc2", "mlp.fc2.bias": "fc2_b",
        }
        for name, w in state.items():
            if name.startswith("encoder.layers."):
                rest = name[len("encoder.layers.") :]
                l_s, sub = rest.split(".", 1)
                tgt = lmap[sub]
                wv = w.T if sub.endswith("weight") else w
                layers.setdefault(tgt, [None] * L)[int(l_s)] = wv
            elif name == "embeddings.patch_embedding.weight":
                out["patch_w"] = w.reshape(w.shape[0], -1).T
            elif name == "embeddings.patch_embedding.bias":
                out["patch_b"] = w
            elif name == "embeddings.position_embedding.weight":
                out["pos_emb"] = w
            elif name == "post_layernorm.weight":
                out.setdefault("post_ln", {})["w"] = w
            elif name == "post_layernorm.bias":
                out.setdefault("post_ln", {})["b"] = w
            elif name == "embeddings.position_ids":
                pass
            else:
                raise KeyError(f"unmapped vision weight {name}")
        out["layers"] = {k: np.stack(v) for k, v in layers.items()}
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), out)

    def __call__(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """[N, C, S, S] -> post-layernormed hidden [N, P, Hv]."""

        def ln(x, p):
            m = jnp.mean(x, axis=-1, keepdims=True)
            v = jnp.var(x, axis=-1, keepdims=True)
            return (x - m) * jax.lax.rsqrt(v + self.eps) * p["w"] + p["b"]

        N = pixel_values.shape[0]
        p, C, Hv = self.patch, self.channels, self.hidden
        grid = self.image_size // p
        x = pixel_values.reshape(N, C, grid, p, grid, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, grid * grid, C * p * p)
        x = x.astype(params["patch_w"].dtype) @ params["patch_w"] + params["patch_b"]
        x = x + params["pos_emb"]

        heads = self.heads
        hd = Hv // heads
        scale = hd**-0.5
        P1 = x.shape[1]

        def body(h, lp):
            y = ln(h, {"w": lp["ln1_w"], "b": lp["ln1_b"]})
            q = (y @ lp["wq"] + lp["bq"]).reshape(N, P1, heads, hd)
            k = (y @ lp["wk"] + lp["bk"]).reshape(N, P1, heads, hd)
            v = (y @ lp["wv"] + lp["bv"]).reshape(N, P1, heads, hd)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k).astype(jnp.float32) * scale
            a = jax.nn.softmax(s, axis=-1).astype(h.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", a, v).reshape(N, P1, Hv)
            h = h + (o @ lp["wo"] + lp["bo"])
            y = ln(h, {"w": lp["ln2_w"], "b": lp["ln2_b"]})
            h = h + (
                jax.nn.gelu(y @ lp["fc1"] + lp["fc1_b"], approximate=True)
                @ lp["fc2"]
                + lp["fc2_b"]
            )
            return h, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        return ln(x, params["post_ln"])
