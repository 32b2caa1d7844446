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


class Phi3ForCausalLM(LlamaForCausalLM):
    """Phi-3 (reference: scratchpad/nn/models/llama/llama.py:419 Phi3 entry):
    the Llama decoder with FUSED qkv_proj / gate_up_proj checkpoints —
    split here at load; longrope scaling handled by compute_inv_freq."""

    def convert_hf_state(self, state, dtype="bfloat16"):
        cfg = self.cfg
        Hq = cfg.num_attention_heads * cfg.head_dim
        Hkv = cfg.num_kv_heads * cfg.head_dim
        I = cfg.intermediate_size
        out = {}
        for name, w in state.items():
            if name.endswith("self_attn.qkv_proj.weight"):
                out[name.replace("qkv_proj", "q_proj")] = w[:Hq]
                out[name.replace("qkv_proj", "k_proj")] = w[Hq : Hq + Hkv]
                out[name.replace("qkv_proj", "v_proj")] = w[Hq + Hkv :]
            elif name.endswith("mlp.gate_up_proj.weight"):
                out[name.replace("gate_up_proj", "gate_proj")] = w[:I]
                out[name.replace("gate_up_proj", "up_proj")] = w[I:]
            else:
                out[name] = w
        return super().convert_hf_state(out, dtype)
