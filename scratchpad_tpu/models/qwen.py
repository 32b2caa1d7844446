"""Qwen2 / Qwen3 (reference: scratchpad/nn/models/qwen/qwen3.py:220).

Both reuse the config-driven Llama decoder: Qwen2 adds qkv biases,
Qwen3 adds per-head qk RMSNorm (no biases).
"""

from __future__ import annotations

from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.models.llama import LlamaForCausalLM


class Qwen2ForCausalLM(LlamaForCausalLM):
    def __init__(self, cfg: ModelConfig):
        cfg.attention_bias = True
        super().__init__(cfg)


class Qwen3ForCausalLM(LlamaForCausalLM):
    def __init__(self, cfg: ModelConfig):
        cfg.use_qk_norm = True
        cfg.attention_bias = False
        super().__init__(cfg)
