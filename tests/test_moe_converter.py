"""MoE weight-converter transform (tools/convert_llama_moe.py)."""

import numpy as np
import pytest

from tools.convert_llama_moe import convert_weights


def test_stacks_expert_indices():
    t = {
        "model.layers.0.moe.mlp.1.w1.weight": np.full((2, 3), 1.0),
        "model.layers.0.moe.mlp.0.w1.weight": np.full((2, 3), 0.0),
        "model.layers.0.moe.mlp.2.w1.weight": np.full((2, 3), 2.0),
        "model.layers.0.moe.gate.weight": np.ones((4, 3)),
        "lm_head.weight": np.ones((5, 3)),
    }
    out = convert_weights(t)
    stacked = out["model.layers.0.moe.mlp.w1.weight"]
    assert stacked.shape == (3, 2, 3)
    for i in range(3):
        assert (stacked[i] == i).all()
    # non-expert keys pass through untouched
    assert out["model.layers.0.moe.gate.weight"].shape == (4, 3)
    assert out["lm_head.weight"].shape == (5, 3)


def test_missing_expert_raises():
    t = {
        "l.moe.mlp.0.w1": np.zeros(2),
        "l.moe.mlp.2.w1": np.zeros(2),
    }
    with pytest.raises(ValueError, match="missing expert"):
        convert_weights(t)
