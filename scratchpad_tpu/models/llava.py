"""Llava-style VLM: CLIP vision tower + MLP projector + Llama decoder.

Counterpart of the reference's multimodal stack (image processor pool,
reference: scratchpad/managers/image_processor.py:281-479, and the Llava /
vision model halves of scratchpad/nn/models/). TPU-native split:

- the vision encoder runs as its OWN jitted step (one compile per image
  count), producing projected image features [N, patches, H_text];
- the engine splices those features into the prompt embedding stream and
  replaces the placeholder ids with content-hashed pseudo ids so the radix
  cache distinguishes different images (analogue of the reference's
  pad_input_ids image-hash scheme);
- the language decoder is the unmodified Llama scan — image rows enter via
  ``ForwardMeta.input_embeds`` and everything downstream (paged KV, decode
  windows, sampling) is ordinary text serving.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.models.llama import LlamaForCausalLM
from scratchpad_tpu.models.vision import CLIPVisionTower


class LlavaForConditionalGeneration(LlamaForCausalLM):
    """Llama decoder + vision params under ``params["vision"]``/"projector"."""

    is_multimodal = True

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        mm = cfg.multimodal or {}
        assert "vision_config" in mm, "Llava config needs multimodal.vision_config"
        self.image_token_index = mm.get("image_token_index", 32000)
        self.vision = CLIPVisionTower(
            mm["vision_config"],
            feature_layer=mm.get("vision_feature_layer", -2),
            select=mm.get("vision_feature_select_strategy", "default"),
        )
        self.projector_act = mm.get("projector_hidden_act", "gelu")

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_patches

    # ------------------------------------------------------------ parameters

    def init_params(self, rng: jax.Array, dtype=jnp.bfloat16) -> dict[str, Any]:
        k1, k2, k3 = jax.random.split(rng, 3)
        params = super().init_params(k1, dtype)
        H, Hv = self.cfg.hidden_size, self.vision.hidden
        params["vision"] = self.vision.init_params(k2, dtype)
        s1, s2 = jax.random.split(k3)
        params["projector"] = {
            "w1": (jax.random.normal(s1, (Hv, H)) / np.sqrt(Hv)).astype(dtype),
            "b1": jnp.zeros((H,), dtype),
            "w2": (jax.random.normal(s2, (H, H)) / np.sqrt(H)).astype(dtype),
            "b2": jnp.zeros((H,), dtype),
        }
        return params

    def param_specs(self, tp_axis: str = "tp") -> dict[str, Any]:
        specs = super().param_specs(tp_axis)
        # the vision tower is small relative to the LM: replicate it
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.init_params(jax.random.PRNGKey(0)),
            is_leaf=lambda x: isinstance(x, jax.Array),
        )
        specs["projector"] = {"w1": P(), "b1": P(), "w2": P(), "b2": P()}
        return specs

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.bfloat16):
        lang, vision, proj = {}, {}, {}
        for name, w in state.items():
            n = name[len("model.") :] if name.startswith("model.") else name
            if n.startswith("vision_tower.vision_model."):
                vision[n[len("vision_tower.vision_model.") :]] = w
            elif n.startswith("multi_modal_projector."):
                proj[n[len("multi_modal_projector.") :]] = w
            elif n.startswith("language_model."):
                rest = n[len("language_model.") :]
                # re-root under the plain-Llama converter's expected names
                if rest.startswith("model.") or rest == "lm_head.weight":
                    lang[rest] = w  # older nesting: language_model.model.*
                else:
                    lang["model." + rest] = w
            elif n == "lm_head.weight":
                lang["lm_head.weight"] = w
            else:
                raise KeyError(f"unmapped HF weight {name}")
        params = super().convert_hf_state(lang, dtype)
        params["vision"] = self.vision.convert_hf_state(vision, dtype)
        params["projector"] = jax.tree.map(
            lambda x: jnp.asarray(x, dtype),
            {
                "w1": proj["linear_1.weight"].T,
                "b1": proj["linear_1.bias"],
                "w2": proj["linear_2.weight"].T,
                "b2": proj["linear_2.bias"],
            },
        )
        return params

    # ---------------------------------------------------------------- vision

    def encode_images(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """[N, C, S, S] -> projected features [N, num_patches, H_text]."""
        feats = self.vision(params["vision"], pixel_values)
        pr = params["projector"]
        act = (
            jax.nn.gelu
            if self.projector_act == "gelu"
            else jax.nn.gelu  # only gelu used by public Llava configs
        )
        h = act(feats @ pr["w1"] + pr["b1"], approximate=False)
        return h @ pr["w2"] + pr["b2"]