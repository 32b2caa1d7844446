"""Model registry mapping HF architecture names to implementations.

Analogue of the reference's EntryClass auto-registry
(reference: scratchpad/nn/models/__init__.py:12-78).
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register(*arch_names: str):
    def deco(cls):
        for n in arch_names:
            _REGISTRY[n] = cls
        return cls

    return deco


def get_model_class(architecture: str):
    _ensure_builtin()
    if architecture not in _REGISTRY:
        raise KeyError(
            f"unsupported architecture {architecture!r}; have {sorted(_REGISTRY)}"
        )
    return _REGISTRY[architecture]


class ModelRegistry:
    @staticmethod
    def resolve_model_cls(architecture: str):
        return get_model_class(architecture)

    @staticmethod
    def supported_architectures() -> list[str]:
        _ensure_builtin()
        return sorted(_REGISTRY)


def _ensure_builtin():
    if _REGISTRY:
        return
    from scratchpad_tpu.models.llama import LlamaForCausalLM

    _REGISTRY["LlamaForCausalLM"] = LlamaForCausalLM
    # Mistral is llama-architecture (same weight names, optional uniform
    # sliding window which the llama forward honors)
    _REGISTRY["MistralForCausalLM"] = LlamaForCausalLM
    try:
        from scratchpad_tpu.models.qwen import (
            Phi3ForCausalLM,
            Qwen2ForCausalLM,
            Qwen3ForCausalLM,
        )

        _REGISTRY["Qwen2ForCausalLM"] = Qwen2ForCausalLM
        _REGISTRY["Qwen3ForCausalLM"] = Qwen3ForCausalLM
        _REGISTRY["Phi3ForCausalLM"] = Phi3ForCausalLM
    except ImportError:
        pass
    try:
        from scratchpad_tpu.models.gemma import (
            Gemma2ForCausalLM,
            Gemma3ForCausalLM,
            Gemma3ForConditionalGeneration,
        )

        _REGISTRY["Gemma2ForCausalLM"] = Gemma2ForCausalLM
        _REGISTRY["Gemma3ForCausalLM"] = Gemma3ForCausalLM
        _REGISTRY["Gemma3ForConditionalGeneration"] = (
            Gemma3ForConditionalGeneration
        )
    except ImportError:
        pass
    try:
        from scratchpad_tpu.models.mixtral import (
            MixtralForCausalLM,
            Qwen3MoeForCausalLM,
        )

        _REGISTRY["MixtralForCausalLM"] = MixtralForCausalLM
        _REGISTRY["Qwen3MoeForCausalLM"] = Qwen3MoeForCausalLM
    except ImportError:
        pass
    try:
        from scratchpad_tpu.models.gpt_oss import GptOssForCausalLM

        _REGISTRY["GptOssForCausalLM"] = GptOssForCausalLM
    except ImportError:
        pass
    try:
        from scratchpad_tpu.models.llama4 import Llama4ForCausalLM

        _REGISTRY["Llama4ForCausalLM"] = Llama4ForCausalLM
        _REGISTRY["Llama4TextModel"] = Llama4ForCausalLM
    except ImportError:
        pass
    try:
        from scratchpad_tpu.models.apertus import ApertusForCausalLM

        _REGISTRY["ApertusForCausalLM"] = ApertusForCausalLM
    except ImportError:
        pass
    try:
        from scratchpad_tpu.models.llava import LlavaForConditionalGeneration

        _REGISTRY["LlavaForConditionalGeneration"] = LlavaForConditionalGeneration
    except ImportError:
        pass
    try:
        from scratchpad_tpu.models.qwen2_vl import (
            Qwen2VLForConditionalGeneration,
        )

        _REGISTRY["Qwen2VLForConditionalGeneration"] = (
            Qwen2VLForConditionalGeneration
        )
    except ImportError:
        pass
    try:
        from scratchpad_tpu.models.mllama import MllamaForCausalLM

        _REGISTRY["MllamaForConditionalGeneration"] = MllamaForCausalLM
    except ImportError:
        pass
    try:
        from scratchpad_tpu.models.deepseek import (
            DeepseekV2ForCausalLM,
            DeepseekV3ForCausalLM,
        )

        _REGISTRY["DeepseekV2ForCausalLM"] = DeepseekV2ForCausalLM
        _REGISTRY["DeepseekV3ForCausalLM"] = DeepseekV3ForCausalLM
    except ImportError:
        pass
