"""GPT-OSS parity vs HF torch on identical tiny weights (attention sinks,
alternating sliding/full layers, clamped-swiglu MoE, yarn rope)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.model_runner import ModelRunner

from tests.utils import greedy_generate


def test_gpt_oss_greedy_parity():
    torch = pytest.importorskip("torch")
    from transformers import GptOssConfig, GptOssForCausalLM as HFGptOss

    hf_cfg = GptOssConfig(
        vocab_size=512,
        hidden_size=128,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        num_local_experts=4,
        num_experts_per_tok=2,
        sliding_window=8,
        max_position_embeddings=1024,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFGptOss(hf_cfg).eval().to(torch.float32)
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(
        {
            **hf_cfg.to_dict(),
            "architectures": ["GptOssForCausalLM"],
        },
        dtype="float32",
    )
    assert cfg.num_experts == 4
    assert cfg.layer_types == ["sliding_attention", "full_attention"]
    from scratchpad_tpu.models.registry import get_model_class

    params = get_model_class("GptOssForCausalLM")(cfg).convert_hf_state(
        state, dtype="float32"
    )
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    runner = ModelRunner(cfg, args, params=params)
    assert runner.attention_backend == "xla"  # sinks + per-layer windows
    rng = np.random.default_rng(8)
    # long enough that layer 0's sliding window (8) actually clips context
    prompt = rng.integers(1, 500, 21).tolist()
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
