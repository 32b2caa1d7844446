"""Qwen2-VL: ViT vision tower (2-D rope + patch merger) + mrope decoder.

Counterpart of the reference's Qwen2-VL support
(reference: scratchpad/nn/models/qwen/qwen2_vl.py and the MRotaryEmbedding
half of scratchpad/nn/layers/rotary_embedding.py:723). TPU-native choices:

- **static resolution**: the reference inherits HF dynamic-resolution
  preprocessing (variable patches per image), which is shape-hostile for
  XLA. Here every image is resized to one fixed square size
  (``multimodal.image_size``, default 448 -> 32x32 patches -> 256 merged
  tokens); the vision step compiles once per image-count bucket.
- the vision tower runs as its own jitted step (same split as Llava); the
  decoder is the shared Llama scan with an mrope branch — full 3-D
  positions only for extend rows with image spans, a per-request scalar
  rope shift everywhere else (the three components are equal beyond the
  prompt, so shifted 1-D rope is exact).
- mrope channel mapping reproduces HF's split of the *doubled* cos/sin
  (see models/common.py:mrope_channel_components).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.models.llama import LlamaForCausalLM
from scratchpad_tpu.models.vision import quick_gelu


class Qwen2VisionTower:
    """HF Qwen2VisionTransformer at one fixed square resolution."""

    def __init__(self, vcfg: dict, image_size: int):
        self.embed = vcfg["embed_dim"]
        self.depth = vcfg["depth"]
        self.heads = vcfg["num_heads"]
        self.mlp_ratio = vcfg.get("mlp_ratio", 4)
        self.channels = vcfg.get("in_channels", 3)
        self.patch = vcfg.get("patch_size", 14)
        self.merge = vcfg.get("spatial_merge_size", 2)
        self.tpatch = vcfg.get("temporal_patch_size", 2)
        self.out_dim = vcfg["hidden_size"]
        self.image_size = image_size
        self.grid = image_size // self.patch
        assert self.grid * self.patch == image_size, (image_size, self.patch)
        assert self.grid % self.merge == 0, (self.grid, self.merge)
        self.head_dim = self.embed // self.heads

    @property
    def num_tokens(self) -> int:
        return (self.grid // self.merge) ** 2

    @property
    def llm_grid(self) -> int:
        return self.grid // self.merge

    # ------------------------------------------------------------ parameters

    def init_params(self, rng: jax.Array, dtype=jnp.float32) -> dict[str, Any]:
        E, L = self.embed, self.depth
        I = E * self.mlp_ratio
        D = self.channels * self.tpatch * self.patch * self.patch
        M = E * self.merge * self.merge
        k = jax.random.split(rng, 6)

        def init(key, shape, scale):
            return (
                jax.random.normal(key, shape, jnp.float32) / np.sqrt(scale)
            ).astype(dtype)

        return {
            "patch_w": init(k[0], (D, E), D),
            "blocks": {
                "ln1_w": jnp.ones((L, E), dtype),
                "ln1_b": jnp.zeros((L, E), dtype),
                "ln2_w": jnp.ones((L, E), dtype),
                "ln2_b": jnp.zeros((L, E), dtype),
                "qkv_w": init(k[1], (L, E, 3 * E), E),
                "qkv_b": jnp.zeros((L, 3 * E), dtype),
                "proj_w": init(k[2], (L, E, E), E),
                "proj_b": jnp.zeros((L, E), dtype),
                "fc1": init(k[3], (L, E, I), E),
                "fc1_b": jnp.zeros((L, I), dtype),
                "fc2": init(k[4], (L, I, E), I),
                "fc2_b": jnp.zeros((L, E), dtype),
            },
            "merger": {
                "ln_w": jnp.ones((E,), dtype),
                "ln_b": jnp.zeros((E,), dtype),
                "w1": init(k[5], (M, M), M),
                "b1": jnp.zeros((M,), dtype),
                "w2": init(k[0], (M, self.out_dim), M),
                "b2": jnp.zeros((self.out_dim,), dtype),
            },
        }

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.float32):
        """Map ``visual.*`` tensors (prefix already stripped)."""
        L = self.depth
        blocks: dict[str, list] = {}
        out: dict[str, Any] = {"merger": {}}
        bmap = {
            "norm1.weight": ("ln1_w", False), "norm1.bias": ("ln1_b", False),
            "norm2.weight": ("ln2_w", False), "norm2.bias": ("ln2_b", False),
            "attn.qkv.weight": ("qkv_w", True), "attn.qkv.bias": ("qkv_b", False),
            "attn.proj.weight": ("proj_w", True), "attn.proj.bias": ("proj_b", False),
            "mlp.fc1.weight": ("fc1", True), "mlp.fc1.bias": ("fc1_b", False),
            "mlp.fc2.weight": ("fc2", True), "mlp.fc2.bias": ("fc2_b", False),
        }
        mmap = {
            "merger.ln_q.weight": "ln_w", "merger.ln_q.bias": "ln_b",
            "merger.mlp.0.weight": "w1", "merger.mlp.0.bias": "b1",
            "merger.mlp.2.weight": "w2", "merger.mlp.2.bias": "b2",
        }
        for name, w in state.items():
            if name.startswith("blocks."):
                l_s, sub = name[len("blocks.") :].split(".", 1)
                tgt, transpose = bmap[sub]
                blocks.setdefault(tgt, [None] * L)[int(l_s)] = (
                    w.T if transpose else w
                )
            elif name == "patch_embed.proj.weight":
                # conv3d [E, C, tp, p, p] -> [C*tp*p*p, E]
                out["patch_w"] = w.reshape(w.shape[0], -1).T
            elif name in mmap:
                tgt = mmap[name]
                out["merger"][tgt] = (
                    w.T if name.endswith("weight") and "ln_q" not in name else w
                )
            else:
                raise KeyError(f"unmapped vision weight {name}")
        out["blocks"] = {k: np.stack(v) for k, v in blocks.items()}
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), out)

    # --------------------------------------------------------------- forward

    def _patchify(self, px: jax.Array) -> jax.Array:
        """[N, C, S, S] (still image, tiled over tp frames) or
        [N, tp, C, S, S] (a REAL temporal patch of tp video frames) ->
        [N, L, C*tp*p*p] in HF merge-block patch order, flattened per
        patch as (C, tp, ph, pw) like HF's Qwen2VLImageProcessor."""
        N = px.shape[0]
        C, p, g, m = self.channels, self.patch, self.grid, self.merge
        if px.ndim == 5:  # video: tp distinct frames per temporal patch
            x = px.reshape(N, self.tpatch, C, g, p, g, p)
            x = x.transpose(0, 3, 5, 2, 1, 4, 6)  # [N, gh, gw, C, tp, p, p]
            x = x.reshape(N, g, g, C, self.tpatch, p * p)
        else:
            x = px.reshape(N, C, g, p, g, p)
            x = x.transpose(0, 2, 4, 1, 3, 5)  # [N, gh, gw, C, p, p]
            # temporal duplication: HF tiles the still image over tp frames
            x = x.reshape(N, g, g, C, 1, p * p)
            x = jnp.broadcast_to(x, (N, g, g, C, self.tpatch, p * p))
        D = C * self.tpatch * p * p
        x = x.reshape(N, g // m, m, g // m, m, D)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # merge-block order (hb, wb, ih, iw)
        return x.reshape(N, g * g, D)

    def _rot_emb(self) -> np.ndarray:
        """Per-patch 2-D rope angles [L, head_dim/2] in merge-block order."""
        g, m = self.grid, self.merge
        hpos = np.arange(g)[:, None] + np.zeros((1, g), np.int64)
        wpos = np.arange(g)[None, :] + np.zeros((g, 1), np.int64)

        def block_order(ids):
            return (
                ids.reshape(g // m, m, g // m, m).transpose(0, 2, 1, 3).reshape(-1)
            )

        hpos, wpos = block_order(hpos), block_order(wpos)
        dim = self.head_dim // 2
        inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        hf = np.outer(hpos, inv)  # [L, hd/4]
        wf = np.outer(wpos, inv)
        return np.concatenate([hf, wf], axis=-1).astype(np.float32)  # [L, hd/2]

    def __call__(self, params: dict, px: jax.Array) -> jax.Array:
        """[N, C, S, S] -> merged patch features [N, L/merge^2, out_dim]."""

        def ln(x, w, b, eps=1e-6):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            return (
                (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
                + b.astype(jnp.float32)
            ).astype(x.dtype)

        N = px.shape[0]
        E, Hn, hd = self.embed, self.heads, self.head_dim
        x = self._patchify(px.astype(params["patch_w"].dtype))
        x = x @ params["patch_w"]  # [N, L, E]
        Lp = x.shape[1]

        ang = jnp.asarray(self._rot_emb())  # [L, hd/2]
        emb = jnp.concatenate([ang, ang], axis=-1)  # [L, hd]
        cos = jnp.cos(emb)[:, None, :]  # [L, 1, hd]
        sin = jnp.sin(emb)[:, None, :]

        def rope(v):  # [N, L, Hn, hd]
            vf = v.astype(jnp.float32)
            v1, v2 = jnp.split(vf, 2, axis=-1)
            rot = jnp.concatenate([-v2, v1], axis=-1)
            return (vf * cos + rot * sin).astype(v.dtype)

        scale = hd**-0.5

        def body(h, bp):
            y = ln(h, bp["ln1_w"], bp["ln1_b"])
            qkv = (y @ bp["qkv_w"] + bp["qkv_b"]).reshape(N, Lp, 3, Hn, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q, k = rope(q), rope(k)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k).astype(jnp.float32) * scale
            a = jax.nn.softmax(s, axis=-1).astype(h.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", a, v).reshape(N, Lp, E)
            h = h + (o @ bp["proj_w"] + bp["proj_b"])
            y = ln(h, bp["ln2_w"], bp["ln2_b"])
            h = h + (
                quick_gelu(y @ bp["fc1"] + bp["fc1_b"]) @ bp["fc2"] + bp["fc2_b"]
            )
            return h, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        mp = params["merger"]
        x = ln(x, mp["ln_w"], mp["ln_b"])
        M = E * self.merge * self.merge
        x = x.reshape(N, Lp * E // M, M)  # consecutive m*m patches = one block
        x = jax.nn.gelu(x @ mp["w1"] + mp["b1"], approximate=False)
        return x @ mp["w2"] + mp["b2"]  # [N, tokens, out_dim]


class Qwen2VLForConditionalGeneration(LlamaForCausalLM):
    """Qwen2 decoder (qkv bias + mrope) with the ViT tower under
    ``params["vision"]``."""

    is_multimodal = True
    uses_mrope = True

    def __init__(self, cfg: ModelConfig):
        cfg.attention_bias = True
        super().__init__(cfg)
        mm = cfg.multimodal or {}
        assert "vision_config" in mm, "Qwen2-VL needs multimodal.vision_config"
        self.image_token_index = mm.get(
            "image_token_index", mm.get("image_token_id", 151655)
        )
        # video frames ride the same ViT; the video placeholder expands to
        # frames x patches tokens with the mrope time axis advancing per
        # frame (HF video_token_id, Qwen2-VL default 151656)
        self.video_token_index = mm.get(
            "video_token_index", mm.get("video_token_id", 151656)
        )
        self.supports_video = True
        self.vision = Qwen2VisionTower(
            mm["vision_config"], image_size=mm.get("image_size", 448)
        )
        if self.mrope_comp is None:
            # checkpoints always carry mrope_section; default to the official
            # split scaled to head_dim if a test config omits it
            from scratchpad_tpu.models.common import mrope_channel_components

            half = self.cfg.head_dim // 2  # official ratio 16:24:24 of 64
            t = half // 4
            h = (half - t) // 2
            sec = [t, h, half - t - h]
            self.mrope_comp = mrope_channel_components(sec, self.cfg.head_dim)

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_tokens

    # ------------------------------------------------------------ parameters

    def init_params(self, rng: jax.Array, dtype=jnp.bfloat16) -> dict[str, Any]:
        k1, k2 = jax.random.split(rng)
        params = super().init_params(k1, dtype)
        params["vision"] = self.vision.init_params(k2, dtype)
        return params

    def param_specs(self, tp_axis: str = "tp") -> dict[str, Any]:
        specs = super().param_specs(tp_axis)
        specs["vision"] = jax.tree.map(
            lambda _: P(),
            self.vision.init_params(jax.random.PRNGKey(0)),
            is_leaf=lambda x: isinstance(x, jax.Array),
        )
        return specs

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.bfloat16):
        lang, vision = {}, {}
        for name, w in state.items():
            n = name
            if n.startswith("model.visual."):  # transformers >= 4.52 layout
                n = n[len("model.") :]
            if n.startswith("model.language_model."):
                n = "model." + n[len("model.language_model.") :]
            if n.startswith("visual."):
                vision[n[len("visual.") :]] = w
            else:
                lang[n] = w
        params = super().convert_hf_state(lang, dtype)
        params["vision"] = self.vision.convert_hf_state(vision, dtype)
        return params

    # ---------------------------------------------------------------- vision

    def encode_images(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """[N, C, S, S] -> merged patch features [N, tokens, H_text]."""
        return self.vision(params["vision"], pixel_values)

    def encode_video(self, params: dict, frames: jax.Array) -> jax.Array:
        """[T, C, S, S] sampled frames -> [grid_t, tokens, H_text].

        HF groups temporal_patch_size consecutive REAL frames per patch
        (video_grid_thw t = T / temporal_patch_size; odd tails repeat the
        last frame) — unlike still images, which tile one frame. The time
        axis of mrope advances per temporal patch (compute_mrope)."""
        T = frames.shape[0]
        tp = self.vision.tpatch
        pad = (-T) % tp
        if pad:
            frames = jnp.concatenate(
                [frames, jnp.repeat(frames[-1:], pad, axis=0)], axis=0
            )
        grid_t = frames.shape[0] // tp
        grouped = frames.reshape((grid_t, tp) + frames.shape[1:])
        return self.vision(params["vision"], grouped)

    # ----------------------------------------------------------- mrope index

    def compute_mrope(
        self, token_ids: list[int], image_spans: list[tuple[int, int]]
    ) -> tuple[np.ndarray, int]:
        """3-D rope positions for a prompt with image/video spans.

        ``image_spans``: (start_row, n_tokens) per image — one fixed-grid
        image (llm_grid x llm_grid tokens) — or (start_row, n_tokens,
        t_frames) for a video of t_frames such grids. Returns (table[3, L],
        delta) following HF get_rope_index (incl. video_grid_thw): text
        advances all components; image/video spans get t=frame index,
        h=row, w=col; the next segment starts at max-component+1
        (reference analogue: MRotaryEmbedding.get_input_positions).
        """
        L = len(token_ids)
        g = self.vision.llm_grid
        table = np.zeros((3, L), np.int64)
        cur = 0  # next start position
        prev_end = 0  # next row to fill
        for span in image_spans:
            start, n = span[0], span[1]
            tframes = span[2] if len(span) > 2 else 1
            tlen = start - prev_end
            if tlen:
                table[:, prev_end:start] = cur + np.arange(tlen)
                cur += tlen
            per = n // tframes
            assert per == g * g and n == tframes * per, (n, g, tframes)
            rows = np.repeat(np.arange(g), g)
            cols = np.tile(np.arange(g), g)
            for f in range(tframes):
                s = start + f * per
                table[0, s : s + per] = cur + f
                table[1, s : s + per] = cur + rows
                table[2, s : s + per] = cur + cols
            cur += max(tframes, g)  # max component + 1
            prev_end = start + n
        if prev_end < L:
            table[:, prev_end:] = cur + np.arange(L - prev_end)
            cur += L - prev_end
        return table.astype(np.int32), int(cur - L)
