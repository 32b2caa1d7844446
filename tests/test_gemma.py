"""Gemma2/Gemma3 parity vs HF torch on identical tiny weights."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.model_runner import ModelRunner

from tests.utils import greedy_generate


def _mk_runner(arch, hf_model, cfg):
    state = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    from scratchpad_tpu.models.registry import get_model_class

    model_cls = get_model_class(arch)
    params = model_cls(cfg).convert_hf_state(state, dtype="float32")
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    return ModelRunner(cfg, args, params=params)


def test_gemma2_greedy_parity_with_sliding_window():
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2ForCausalLM

    kw = dict(
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
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
    )
    hf_cfg = Gemma2Config(**kw, attn_implementation="eager")
    torch.manual_seed(0)
    hf_model = Gemma2ForCausalLM(hf_cfg).eval().to(torch.float32)

    cfg = ModelConfig(
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
    )
    runner = _mk_runner("Gemma2ForCausalLM", hf_model, cfg)
    rng = np.random.default_rng(3)
    # prompt longer than the sliding window so local layers actually mask
    prompt = rng.integers(1, 500, 40).tolist()
    ours = greedy_generate(runner, prompt, 8)
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt]),
            max_new_tokens=8,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    theirs = hf_out[0, len(prompt) :].tolist()
    assert ours == theirs, f"{ours} vs {theirs}"


def test_gemma3_greedy_parity():
    torch = pytest.importorskip("torch")
    try:
        from transformers import Gemma3TextConfig, Gemma3ForCausalLM
    except ImportError:
        pytest.skip("no Gemma3 in transformers")

    kw = dict(
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=6,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=1024,
        rms_norm_eps=1e-5,
        rope_theta=1000000.0,
        rope_local_base_freq=10000.0,
        query_pre_attn_scalar=32,
        sliding_window=16,
        sliding_window_pattern=6,
    )
    hf_cfg = Gemma3TextConfig(**kw, attn_implementation="eager")
    torch.manual_seed(0)
    hf_model = Gemma3ForCausalLM(hf_cfg).eval().to(torch.float32)

    cfg = ModelConfig(
        architecture="Gemma3ForCausalLM",
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=6,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=1024,
        rms_norm_eps=1e-5,
        rope_theta=1000000.0,
        query_pre_attn_scalar=32,
        sliding_window=16,
        sliding_window_pattern=6,
        tie_word_embeddings=True,
    )
    runner = _mk_runner("Gemma3ForCausalLM", hf_model, cfg)
    rng = np.random.default_rng(4)
    prompt = rng.integers(1, 500, 40).tolist()
    ours = greedy_generate(runner, prompt, 8)
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt]),
            max_new_tokens=8,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    theirs = hf_out[0, len(prompt) :].tolist()
    assert ours == theirs, f"{ours} vs {theirs}"
