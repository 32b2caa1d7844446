"""Apertus (xIELU + qk-norm) parity vs HF torch."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.model_runner import ModelRunner

from tests.utils import greedy_generate


def test_apertus_greedy_parity():
    torch = pytest.importorskip("torch")
    from transformers import ApertusConfig, ApertusForCausalLM as HFApertus

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
        tie_word_embeddings=False,
    )
    hf_cfg = ApertusConfig(**kw, attn_implementation="eager")
    torch.manual_seed(0)
    hf = HFApertus(hf_cfg).eval().to(torch.float32)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig(architecture="ApertusForCausalLM", **kw)
    from scratchpad_tpu.models.registry import get_model_class

    params = get_model_class("ApertusForCausalLM")(cfg).convert_hf_state(
        state, dtype="float32"
    )
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    runner = ModelRunner(cfg, args, params=params)
    rng = np.random.default_rng(11)
    prompt = rng.integers(1, 500, 14).tolist()
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
