"""Engine-level parity for the gqa_xla hybrid decode backend.

Models with per-layer dynamic masks (Gemma window alternation, GPT-OSS
sinks + alternating windows, Llama-4 chunked attention) keep the masked
XLA extend path but decode through the gqa flash-decode kernel's
dynamic-mask support. On CPU the kernel runs in interpret mode; an
explicit ``attention_backend="gqa"`` opts in, and greedy outputs must
match the default XLA backend exactly.
"""

import numpy as np

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.model_runner import ModelRunner

from tests.utils import greedy_generate


GEMMA2 = ModelConfig(
    architecture="Gemma2ForCausalLM",
    vocab_size=512,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=32,
    max_position_embeddings=1024,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    query_pre_attn_scalar=32,
    sliding_window=16,
    attn_logit_softcap=50.0,
    logit_softcap=30.0,
    tie_word_embeddings=True,
    dtype="float32",
)

GPT_OSS = ModelConfig(
    architecture="GptOssForCausalLM",
    vocab_size=512,
    hidden_size=128,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=32,
    num_experts=4,
    num_experts_per_tok=2,
    sliding_window=8,
    layer_types=["sliding_attention", "full_attention"],
    attention_bias=True,
    max_position_embeddings=1024,
    rms_norm_eps=1e-5,
    tie_word_embeddings=False,
    dtype="float32",
)

LLAMA4 = ModelConfig(
    architecture="Llama4ForCausalLM",
    vocab_size=512,
    hidden_size=128,
    intermediate_size=96,
    intermediate_size_mlp=160,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=32,
    num_experts=4,
    num_experts_per_tok=2,
    interleave_moe_layer_step=2,
    use_qk_norm=True,
    attn_temperature_tuning=True,
    floor_scale=8,
    attention_chunk_size=8,
    no_rope_layers=[1, 1, 1, 0],  # layer 3 = NoPE (global attention)
    max_position_embeddings=1024,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    dtype="float32",
)


def _generate(cfg, backend, prompt, n_new=8):
    args = ServerArgs(
        random_weights=True,
        max_total_tokens=4096,
        page_size=4,
        dtype="float32",
        attention_backend=backend,
    )
    runner = ModelRunner(cfg, args)
    if backend == "gqa":
        assert runner.attention_backend == "gqa_xla", runner.attention_backend
    return greedy_generate(runner, prompt, n_new)


def _check(cfg, prompt_len, seed=3):
    prompt = np.random.default_rng(seed).integers(1, 500, prompt_len).tolist()
    ref = _generate(cfg, "auto", prompt)
    got = _generate(cfg, "gqa", prompt)
    assert got == ref, f"{got} vs {ref}"


def test_gemma2_gqa_xla_parity():
    # prompt longer than the window so local layers mask (and the kernel
    # skips whole leading chunks)
    _check(GEMMA2, prompt_len=40)


def test_gpt_oss_gqa_xla_parity():
    # sinks + alternating 8-wide sliding / full layers
    _check(GPT_OSS, prompt_len=21)


def test_llama4_gqa_xla_parity():
    # chunked mask (8) on rope layers, global NoPE layer
    _check(LLAMA4, prompt_len=21)
