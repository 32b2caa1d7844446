"""Rope scaling parity vs transformers' reference implementations."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.models.common import compute_inv_freq, rope_attention_scale


def hf_inv_freq(rope_scaling, head_dim=64, theta=10000.0, max_pos=8192):
    from transformers import LlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    cfg = LlamaConfig(
        hidden_size=head_dim * 4,
        num_attention_heads=4,
        rope_theta=theta,
        max_position_embeddings=max_pos,
        rope_scaling=rope_scaling,
    )
    rope_type = (
        rope_scaling.get("rope_type", rope_scaling.get("type", "default"))
        if rope_scaling
        else "default"
    )
    kw = {}
    if rope_type == "longrope":
        # HF switches factors by runtime seq_len; we bake the deployed max
        # context in at startup, so compare HF evaluated at that length
        cfg.original_max_position_embeddings = rope_scaling[
            "original_max_position_embeddings"
        ]
        kw["seq_len"] = cfg.max_position_embeddings
    inv, att = ROPE_INIT_FUNCTIONS[rope_type](cfg, device="cpu", **kw)
    return np.asarray(inv.to(torch.float64)), float(att)


def ours(rope_scaling, head_dim=64, theta=10000.0, max_pos=8192):
    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=head_dim * 4,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=4,
        vocab_size=16,
        head_dim=head_dim,
        rope_theta=theta,
        max_position_embeddings=max_pos,
        rope_scaling=rope_scaling,
    )
    return compute_inv_freq(cfg), rope_attention_scale(cfg)


CASES = {
    "none": None,
    "linear": {"rope_type": "linear", "factor": 4.0},
    "llama3": {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 8192,
    },
    "yarn": {
        "rope_type": "yarn",
        "factor": 4.0,
        "original_max_position_embeddings": 2048,
    },
    "yarn-betas": {
        "rope_type": "yarn",
        "factor": 8.0,
        "beta_fast": 48.0,
        "beta_slow": 2.0,
        "original_max_position_embeddings": 4096,
    },
    "longrope": {
        "rope_type": "longrope",
        "factor": 2.0,
        "short_factor": [1.0 + 0.01 * i for i in range(32)],
        "long_factor": [2.0 + 0.05 * i for i in range(32)],
        "original_max_position_embeddings": 4096,
    },
}


@pytest.mark.parametrize("name", list(CASES))
def test_inv_freq_matches_hf(name):
    rs = CASES[name]
    inv_hf, att_hf = hf_inv_freq(rs)
    inv_us, att_us = ours(rs)
    np.testing.assert_allclose(inv_us, inv_hf, rtol=2e-6)
    # ours folds the cos/sin multiplier into sm_scale => logit space = att^2
    np.testing.assert_allclose(att_us, att_hf**2, rtol=1e-6)


def test_yarn_scales_attention():
    _, att = ours(CASES["yarn"])
    expected = (0.1 * np.log(4.0) + 1.0) ** 2
    assert abs(att - expected) < 1e-9


def test_longrope_short_context_uses_short_factor():
    rs = dict(CASES["longrope"], original_max_position_embeddings=8192)
    inv_us, att = ours(rs)  # max_pos == orig -> short factors, no scaling
    base = 1.0 / (10000.0 ** (np.arange(0, 64, 2) / 64))
    np.testing.assert_allclose(
        inv_us, base / np.asarray(rs["short_factor"]), rtol=1e-6
    )
    assert att == 1.0
