"""Mixtral MoE parity vs HF torch on identical tiny weights."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.model_runner import ModelRunner

from tests.utils import greedy_generate


def test_mixtral_greedy_parity():
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM as HFMixtral

    kw = dict(
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=1024,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        num_local_experts=4,
        num_experts_per_tok=2,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    hf_cfg = MixtralConfig(**kw, attn_implementation="eager")
    torch.manual_seed(0)
    hf = HFMixtral(hf_cfg).eval().to(torch.float32)
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig(
        architecture="MixtralForCausalLM",
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=1024,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        num_experts=4,
        num_experts_per_tok=2,
        tie_word_embeddings=False,
    )
    from scratchpad_tpu.models.registry import get_model_class

    params = get_model_class("MixtralForCausalLM")(cfg).convert_hf_state(
        state, dtype="float32"
    )
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    runner = ModelRunner(cfg, args, params=params)
    rng = np.random.default_rng(8)
    prompt = rng.integers(1, 500, 15).tolist()
    ours = greedy_generate(runner, prompt, 8)
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor([prompt]),
            max_new_tokens=8,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    theirs = hf_out[0, len(prompt) :].tolist()
    assert ours == theirs, f"{ours} vs {theirs}"


def test_expert_parallel_matches_single_device():
    """EP (experts sharded over tp, psum combine) == single-device greedy."""
    import jax
    from jax.sharding import Mesh

    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    cfg_kw = dict(
        architecture="MixtralForCausalLM",
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_experts=4,
        num_experts_per_tok=2,
        tie_word_embeddings=False,
    )
    args_kw = dict(
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
    )
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 500, n).tolist() for n in (11, 23)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)

    ref_eng = Engine(ServerArgs(**args_kw), model_config=ModelConfig(**cfg_kw))
    ref = [
        o.output_ids
        for o in ref_eng.generate(input_ids=prompts, sampling_params=[sp] * 2)
    ]

    mesh = Mesh(np.array(devs[:2]).reshape(1, 2), ("dp", "tp"))
    eng = Engine(
        ServerArgs(**args_kw, enable_ep=True),
        mesh=mesh,
        model_config=ModelConfig(**cfg_kw),
    )
    assert eng.scheduler.runner.model.use_ep
    got = [
        o.output_ids
        for o in eng.generate(input_ids=prompts, sampling_params=[sp] * 2)
    ]
    assert got == ref
    eng.scheduler.check_memory_leak()


def test_qwen3_moe_greedy_parity():
    """Qwen3-MoE (qk-norm + sparse experts) vs HF torch, identical weights."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM as HFQwen3Moe

    hf_cfg = Qwen3MoeConfig(
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        moe_intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=1024,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        decoder_sparse_step=1,
        tie_word_embeddings=False,
        attention_bias=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFQwen3Moe(hf_cfg).eval().to(torch.float32)
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig(
        architecture="Qwen3MoeForCausalLM",
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        moe_intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=1024,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        tie_word_embeddings=False,
    )
    from scratchpad_tpu.models.registry import get_model_class

    params = get_model_class("Qwen3MoeForCausalLM")(cfg).convert_hf_state(
        state, dtype="float32"
    )
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    runner = ModelRunner(cfg, args, params=params)
    rng = np.random.default_rng(8)
    prompt = rng.integers(1, 500, 15).tolist()
    ours = greedy_generate(runner, prompt, 8)
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor([prompt]),
            max_new_tokens=8,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    theirs = hf_out[0, len(prompt) :].tolist()
    assert ours == theirs, f"{ours} vs {theirs}"
