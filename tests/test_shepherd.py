"""Shepherd router tests with a deterministic toy embedding."""

import numpy as np

from scratchpad_tpu.extensions.shepherd import Route, ShepherdRouter


def toy_embed(text: str) -> np.ndarray:
    """Bag-of-chars embedding: same-topic strings land close together."""
    v = np.zeros(64, np.float32)
    for i, c in enumerate(text.lower()):
        v[ord(c) % 64] += 1.0
    return v


ROUTES = [
    Route(
        name="code",
        model="coder-7b",
        utterances=[
            "write a python function for sorting",
            "fix this python bug in my function",
            "refactor the python class",
        ],
    ),
    Route(
        name="math",
        model="math-70b",
        utterances=[
            "solve 12 + 35 * 2",
            "integrate x^2 dx 12 34",
            "compute 123 456 789 sum",
        ],
    ),
]


def test_routes_to_similar_topic():
    r = ShepherdRouter(ROUTES, toy_embed)
    assert r.route("please write a python function to parse") == "code"
    assert r.route("compute 12 * 345 + 6789") == "math"
    assert r.target_model("python function bug") == "coder-7b"


def test_max_policy_and_threshold_fallback():
    r = ShepherdRouter(
        ROUTES, toy_embed, policy="max", threshold=0.99, default_route="code"
    )
    # nothing is 0.99-similar to this junk -> default
    assert r.route("zzzzqqqq!!!???") == "code"
