"""Sort-free fused sampling filter vs an explicit sort-based reference.

The production filter (`scratchpad_tpu/sampling/sampler.py:_fused_cutoff`)
finds the joint top-k/top-p/min-p cutoff by multi-way bisection; these
tests assert it keeps the same token set as the O(V log V) sort-based
construction (the round-1 implementation, and what the reference engine
gets from flashinfer: scratchpad/nn/kernels/sampling.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scratchpad_tpu.sampling.batch_info import SamplingBatchInfo
from scratchpad_tpu.sampling.sampler import _NEG, _fused_cutoff, sample


def _sort_reference_keep(scaled, top_k, top_p, min_p):
    """The exact sort-based joint filter (round-1 sampler semantics)."""
    scaled = np.asarray(scaled, np.float32)
    B, V = scaled.shape
    probs = np.asarray(jax.nn.softmax(jnp.asarray(scaled), axis=-1))
    keep = np.ones((B, V), bool)
    for b in range(B):
        sp = np.sort(probs[b])[::-1]
        kth = sp[min(max(int(top_k[b]) - 1, 0), V - 1)]
        k_keep = probs[b] >= kth if top_k[b] < V else np.ones(V, bool)
        cum_before = np.cumsum(sp) - sp
        num_kept = int(np.sum(cum_before < top_p[b]))
        pth = sp[min(max(num_kept - 1, 0), V - 1)]
        p_keep = probs[b] >= pth if top_p[b] < 1.0 else np.ones(V, bool)
        m_keep = (
            probs[b] >= sp[0] * min_p[b] if min_p[b] > 0 else np.ones(V, bool)
        )
        keep[b] = k_keep & p_keep & m_keep
    return keep


def _fused_keep(scaled, top_k, top_p, min_p):
    # the sort-exactness contract is asserted at the high-precision
    # schedule (8 taps x 6 iters ~ 1.5e-4 cutoff error); the serving
    # default trades precision for throughput (see sampler.py)
    cutoff = _fused_cutoff(
        jnp.asarray(scaled, jnp.float32),
        jnp.asarray(top_k, jnp.int32),
        jnp.asarray(top_p, jnp.float32),
        jnp.asarray(min_p, jnp.float32),
        taps=8,
        iters=6,
    )
    return np.asarray(jnp.asarray(scaled) >= cutoff), np.asarray(cutoff)


def _assert_keep_matches(scaled, top_k, top_p, min_p, tol=2e-3):
    got, cutoff = _fused_keep(scaled, top_k, top_p, min_p)
    want = _sort_reference_keep(scaled, top_k, top_p, min_p)
    scaled = np.asarray(scaled)
    for b in range(scaled.shape[0]):
        diff = got[b] != want[b]
        if diff.any():
            # bisection converges to within ~1.5e-4 of the exact threshold;
            # only near-tie tokens hugging the cutoff may flip
            assert np.all(np.abs(scaled[b, diff] - cutoff[b, 0]) < tol), (
                b,
                np.abs(scaled[b, diff] - cutoff[b, 0]).max(),
            )


def test_topk_only_matches_sort():
    rng = np.random.default_rng(0)
    scaled = rng.normal(size=(6, 4096)).astype(np.float32) * 3
    V = scaled.shape[1]
    top_k = np.array([1, 5, 40, 500, V, 2], np.int32)
    _assert_keep_matches(scaled, top_k, np.ones(6), np.zeros(6))


def test_topp_only_matches_sort():
    rng = np.random.default_rng(1)
    scaled = rng.normal(size=(6, 4096)).astype(np.float32) * 4
    top_p = np.array([0.1, 0.5, 0.9, 0.99, 1.0, 0.7], np.float32)
    V = scaled.shape[1]
    _assert_keep_matches(scaled, np.full(6, V, np.int32), top_p, np.zeros(6))


def test_minp_only_matches_sort():
    rng = np.random.default_rng(2)
    scaled = rng.normal(size=(4, 2048)).astype(np.float32) * 5
    min_p = np.array([0.01, 0.05, 0.2, 0.0], np.float32)
    V = scaled.shape[1]
    _assert_keep_matches(scaled, np.full(4, V, np.int32), np.ones(4), min_p)


def test_joint_filter_matches_sort():
    rng = np.random.default_rng(3)
    scaled = rng.normal(size=(8, 4096)).astype(np.float32) * 3
    V = scaled.shape[1]
    top_k = np.array([50, V, 10, 1000, V, 3, 64, V], np.int32)
    top_p = np.array([0.9, 0.8, 1.0, 0.95, 1.0, 0.5, 0.99, 0.3], np.float32)
    min_p = np.array([0.0, 0.02, 0.0, 0.01, 0.1, 0.0, 0.0, 0.05], np.float32)
    _assert_keep_matches(scaled, top_k, top_p, min_p)


def test_low_temperature_scaled_logits():
    # temperature 0.05 -> scaled-logit range ~hundreds; the z-floor clamp
    # must still keep the head of the distribution exact
    rng = np.random.default_rng(4)
    scaled = (rng.normal(size=(4, 4096)).astype(np.float32) * 4) / 0.05
    V = scaled.shape[1]
    top_k = np.array([5, 20, V, 2], np.int32)
    top_p = np.array([1.0, 0.9, 0.9, 1.0], np.float32)
    got, _ = _fused_keep(scaled, top_k, top_p, np.zeros(4))
    for b in range(4):
        assert got[b, np.argmax(scaled[b])]
        order = np.argsort(scaled[b])[::-1]
        if top_k[b] < V:
            # kept set is always within the top-k head...
            assert not got[b, order[top_k[b] :]].any()
            # ...and exactly the top-k head when top-p is disabled
            if top_p[b] >= 1.0:
                assert got[b, order[: top_k[b]]].all()


def test_bitmask_banned_tokens_never_kept():
    rng = np.random.default_rng(5)
    scaled = rng.normal(size=(2, 1024)).astype(np.float32)
    scaled[:, ::2] = _NEG  # banned half the vocab
    got, _ = _fused_keep(
        scaled,
        np.array([10, 1024], np.int32),
        np.array([1.0, 0.9], np.float32),
        np.zeros(2, np.float32),
    )
    assert not got[:, ::2].any()
    assert got[0].sum() == 10
    assert got[1].any()


def test_topk_wider_than_allowed_support():
    # bitmask leaves 4 tokens but top_k=50: the filter must keep all 4
    scaled = np.full((1, 512), _NEG, np.float32)
    scaled[0, [7, 90, 200, 311]] = [1.0, 0.5, 2.0, -0.5]
    got, _ = _fused_keep(
        scaled,
        np.array([50], np.int32),
        np.array([1.0], np.float32),
        np.zeros(1, np.float32),
    )
    assert got[0, [7, 90, 200, 311]].all()
    assert got[0].sum() == 4


def test_sampled_draws_respect_topk():
    V = 512
    rng = np.random.default_rng(6)
    logits = rng.normal(size=(1, V)).astype(np.float32) * 2
    info = SamplingBatchInfo(
        temperature=jnp.ones(1, jnp.float32),
        top_p=jnp.ones(1, jnp.float32),
        top_k=jnp.full(1, 5, jnp.int32),
        min_p=jnp.zeros(1, jnp.float32),
    )
    allowed = set(np.argsort(logits[0])[::-1][:5].tolist())
    key = jax.random.PRNGKey(0)
    draws = set()
    for i in range(64):
        ids, _ = sample(jnp.asarray(logits), info, jax.random.fold_in(key, i))
        draws.add(int(ids[0]))
    assert draws <= allowed
    assert len(draws) > 1  # actually sampling, not argmax


def test_greedy_rows_unaffected_by_sampled_rows():
    V = 1024
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(3, V)).astype(np.float32)
    info = SamplingBatchInfo(
        temperature=jnp.asarray([0.0, 0.8, 0.0], jnp.float32),
        top_p=jnp.asarray([1.0, 0.9, 1.0], jnp.float32),
        top_k=jnp.asarray([V, 40, V], jnp.int32),
        min_p=jnp.zeros(3, jnp.float32),
    )
    ids, _ = sample(jnp.asarray(logits), info, jax.random.PRNGKey(1))
    assert int(ids[0]) == int(np.argmax(logits[0]))
    assert int(ids[2]) == int(np.argmax(logits[2]))


@pytest.mark.parametrize("top_p", [1e-6, 0.0])
def test_tiny_topp_keeps_argmax(top_p):
    rng = np.random.default_rng(8)
    scaled = rng.normal(size=(1, 2048)).astype(np.float32)
    got, _ = _fused_keep(
        scaled,
        np.array([2048], np.int32),
        np.array([top_p], np.float32),
        np.zeros(1, np.float32),
    )
    if top_p > 0:
        assert got[0, np.argmax(scaled[0])]
        assert got[0].sum() == 1


def test_logit_bias_applied():
    """OpenAI logit_bias shifts logits before penalties/softmax
    (reference: nn/layers/sampler.py:162 custom processors)."""
    key = jax.random.PRNGKey(0)
    B, V = 2, 64
    logits = jax.random.normal(jax.random.PRNGKey(1), (B, V), jnp.float32)
    bias = np.zeros((B, V), np.float32)
    bias[0, 7] = 100.0  # dominate row 0
    bias[1, int(np.argmax(np.asarray(logits)[1]))] = -100.0  # ban row-1 argmax
    info = SamplingBatchInfo(
        temperature=jnp.zeros(B),
        top_p=jnp.ones(B),
        top_k=jnp.full(B, V, jnp.int32),
        min_p=jnp.zeros(B),
        logit_bias=jnp.asarray(bias),
    )
    ids, _ = sample(logits, info, key)
    ids = np.asarray(ids)
    assert ids[0] == 7
    assert ids[1] != int(np.argmax(np.asarray(logits)[1]))


def test_logit_bias_engine_e2e():
    """Greedy decode with a +100 bias emits only the biased token."""
    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.server.engine import Engine
    from scratchpad_tpu.sampling.sampling_params import SamplingParams

    args = ServerArgs(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=1024,
    )
    engine = Engine(args)
    sp = SamplingParams(
        temperature=0.0,
        max_new_tokens=4,
        ignore_eos=True,
        logit_bias={5: 100.0},
    )
    out = engine.generate(input_ids=[1, 2, 3], sampling_params=sp)
    assert out.output_ids == [5, 5, 5, 5], out.output_ids


def test_serving_budget_tv_bound():
    """Exactness gate for the SERVING bisection budget (VERDICT r3 weak 5):
    on adversarial rows — a large near-tie cluster straddling the top-k /
    top-p cutoff — the total-variation distance between the bisection-
    filtered distribution and the sort-exact one must stay below 1% at the
    DEFAULT taps x iters (no env overrides). The r3 default (2x6) measured
    TV up to 0.13 on these rows; the 2x10 serving default bounds it."""
    import numpy as np
    import jax.numpy as jnp

    from scratchpad_tpu.sampling.sampler import (
        _BISECT_ITERS,
        _BISECT_TAPS,
        _fused_cutoff,
    )

    rng = np.random.default_rng(0)
    V = 4096

    def worst_tv(logits, top_k, top_p):
        B = logits.shape[0]
        cut = np.asarray(
            _fused_cutoff(
                jnp.asarray(logits),
                jnp.full(B, top_k, jnp.int32),
                jnp.full(B, top_p, jnp.float32),
                jnp.zeros(B, jnp.float32),
                taps=_BISECT_TAPS,
                iters=_BISECT_ITERS,
            )
        )
        tvs = []
        for b in range(B):
            row = logits[b]
            order = np.argsort(-row)
            keep = np.zeros(V, bool)
            keep[order[: min(top_k, V)]] = True
            e = np.exp(row - row.max())
            p = e / e.sum()
            cum = np.cumsum(p[order])
            keep_p = np.zeros(V, bool)
            keep_p[order[: np.searchsorted(cum, top_p) + 1]] = True
            pe = np.where(keep & keep_p, p, 0)
            pe = pe / pe.sum()
            pa = np.where(row >= cut[b], p, 0)
            pa = pa / pa.sum()
            tvs.append(0.5 * np.abs(pe - pa).sum())
        return max(tvs)

    adversarial = [
        # thousands of near-identical logits: any cutoff error flips many
        rng.normal(0, 0.01, (8, V)).astype(np.float32),
        # head of 64 strong tokens + a flat 4032-token near-tie tail
        np.concatenate(
            [rng.normal(5, 1, (8, 64)), rng.normal(0, 0.005, (8, V - 64))],
            axis=1,
        ).astype(np.float32),
    ]
    worst = 0.0
    for L in adversarial:
        for tk, tp in [(64, 1.0), (V, 0.9), (512, 0.95)]:
            worst = max(worst, worst_tv(L, tk, tp))
    assert worst < 0.01, f"serving-budget TV {worst:.4f} exceeds 1%"
