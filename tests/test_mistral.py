"""Mistral parity vs HF torch (llama-architecture alias + sliding window)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.model_runner import ModelRunner

from tests.utils import greedy_generate


@pytest.mark.parametrize("window", [None, 8])
def test_mistral_greedy_parity(window):
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralForCausalLM as HFMistral

    hf_cfg = MistralConfig(
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
        sliding_window=window,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFMistral(hf_cfg).eval().to(torch.float32)
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(
        {**hf_cfg.to_dict(), "architectures": ["MistralForCausalLM"]},
        dtype="float32",
    )
    from scratchpad_tpu.models.registry import get_model_class

    params = get_model_class("MistralForCausalLM")(cfg).convert_hf_state(
        state, dtype="float32"
    )
    args = ServerArgs(
        max_total_tokens=4096,
        page_size=4,
        dtype="float32",
        attention_backend="xla" if window else "auto",
    )
    runner = ModelRunner(cfg, args, params=params)
    rng = np.random.default_rng(8)
    # longer than the window so the sliding mask actually clips
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
    assert ours == theirs, f"window={window}: {ours} vs {theirs}"
