"""ngram/prompt-lookup speculative decoding: exact greedy equivalence."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.server.engine import Engine


def make_engine(**kw):
    args = ServerArgs(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
        **kw,
    )
    return Engine(args)


def test_ngram_proposer():
    from scratchpad_tpu.core.req import Req

    eng = make_engine(speculative_algorithm="ngram")
    sched = eng.scheduler
    r = Req(
        rid="x",
        origin_input_ids=[1, 2, 3, 4, 5, 1, 2, 3],
        sampling_params=SamplingParams(),
    )
    # suffix [1,2,3] matched earlier -> proposes continuation [4,5,1,2]
    assert sched._propose_ngram(r, 4) == [4, 5, 1, 2]
    r2 = Req(rid="y", origin_input_ids=[7, 8, 9], sampling_params=SamplingParams())
    assert sched._propose_ngram(r2, 4) == []


@pytest.mark.parametrize("prompt_kind", ["repetitive", "random"])
def test_spec_matches_plain_greedy(prompt_kind):
    rng = np.random.default_rng(0)
    if prompt_kind == "repetitive":
        base = rng.integers(1, 100, 6).tolist()
        prompts = [base * 4, (base + [7, 9]) * 3]
    else:
        prompts = [rng.integers(1, 500, n).tolist() for n in (17, 31)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True)

    ref_eng = make_engine()
    ref = [
        o.output_ids
        for o in ref_eng.generate(input_ids=prompts, sampling_params=[sp] * 2)
    ]

    eng = make_engine(speculative_algorithm="ngram")
    got = [
        o.output_ids
        for o in eng.generate(input_ids=prompts, sampling_params=[sp] * 2)
    ]
    assert got == ref
    if prompt_kind == "repetitive":  # random prompts may never n-gram-hit
        assert eng.scheduler.num_spec_steps > 0
    eng.scheduler.check_memory_leak()


def test_spec_acceptance_on_forced_repetition():
    """A model decoding into a loop must accept drafts (the whole point)."""
    eng = make_engine(speculative_algorithm="ngram")
    sp = SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True)
    base = [5, 6, 7, 8]
    out = eng.generate(input_ids=base * 6, sampling_params=sp)
    assert len(out.output_ids) == 32
    sched = eng.scheduler
    # greedy decode of a tiny random model on a periodic prompt almost
    # always cycles; require SOME accepted drafts across the run
    assert sched.num_spec_accepted > 0, (
        sched.num_spec_steps,
        sched.num_spec_accepted,
    )
    sched.check_memory_leak()


def test_draft_model_same_weights_accepts_everything():
    """Draft == target (same seed/config): every draft must be accepted."""
    eng = make_engine(
        speculative_algorithm="draft", speculative_draft_preset="tiny-debug"
    )
    # identical init: same preset + same random seed -> same weights
    sp = SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True)
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, 500, 13).tolist()
    out = eng.generate(input_ids=prompt, sampling_params=sp)
    assert len(out.output_ids) == 24
    sched = eng.scheduler
    assert sched.num_spec_steps > 0
    k = eng.args.speculative_num_draft_tokens
    # perfect drafts: k accepted per verify (+1 bonus) on every step except
    # the last, which the max_new_tokens cap may truncate mid-row
    assert sched.num_spec_accepted >= (sched.num_spec_steps - 1) * k, (
        sched.num_spec_steps,
        sched.num_spec_accepted,
    )
    sched.check_memory_leak()


def test_draft_model_matches_plain_greedy():
    """A WRONG draft (different weights) must still give exact greedy
    output — only throughput, never content, may change."""
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 500, n).tolist() for n in (11, 29)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=20, ignore_eos=True)

    ref_eng = make_engine()
    ref = [
        o.output_ids
        for o in ref_eng.generate(input_ids=prompts, sampling_params=[sp] * 2)
    ]
    eng = make_engine(
        speculative_algorithm="draft", speculative_draft_preset="tiny-debug"
    )
    # make the draft disagree with the target: perturb its weights
    import jax

    dr = eng.scheduler.draft_runner
    dr.params = jax.tree.map(lambda x: x * 1.25, dr.params)
    got = [
        o.output_ids
        for o in eng.generate(input_ids=prompts, sampling_params=[sp] * 2)
    ]
    assert got == ref
    eng.scheduler.check_memory_leak()


def test_draft_model_after_plain_decode_catches_up():
    """min_new_tokens forces plain decode first; the draft must catch up
    its KV before speculating, and output must equal plain greedy."""
    eng = make_engine(
        speculative_algorithm="draft", speculative_draft_preset="tiny-debug"
    )
    sp = SamplingParams(
        temperature=0.0, max_new_tokens=20, min_new_tokens=6, ignore_eos=True
    )
    prompt = [9, 10, 11, 12, 13]
    out = eng.generate(input_ids=prompt, sampling_params=sp)
    ref = make_engine().generate(input_ids=prompt, sampling_params=sp)
    assert out.output_ids == ref.output_ids
    assert eng.scheduler.num_spec_steps > 0  # did speculate after catch-up
    eng.scheduler.check_memory_leak()


def test_spec_respects_stop_and_sampled_fallback():
    eng = make_engine(speculative_algorithm="ngram")
    # stop token mid-stream truncates accepted drafts
    sp = SamplingParams(temperature=0.0, max_new_tokens=16)
    out = eng.generate(input_ids=[3, 4] * 8, sampling_params=sp)
    assert len(out.output_ids) <= 16
    # sampled requests ride the sampled verify path (still correct)
    sp2 = SamplingParams(temperature=0.8, max_new_tokens=8, ignore_eos=True)
    out2 = eng.generate(input_ids=[9, 10, 9, 10], sampling_params=sp2)
    assert len(out2.output_ids) == 8
    eng.scheduler.check_memory_leak()


def test_spec_sampled_topk1_matches_greedy():
    """Sampled speculative decoding, exactness corner: temperature > 0 with
    top_k = 1 IS argmax, so the sampled-verify path must reproduce the
    plain greedy output token-for-token while still accepting drafts."""
    rng = np.random.default_rng(0)
    base = rng.integers(1, 100, 6).tolist()
    prompts = [base * 4, (base + [7, 9]) * 3]
    greedy = SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True)
    ref = [
        o.output_ids
        for o in make_engine().generate(
            input_ids=prompts, sampling_params=[greedy] * 2
        )
    ]
    k1 = SamplingParams(
        temperature=0.7, top_k=1, max_new_tokens=24, ignore_eos=True
    )
    eng = make_engine(speculative_algorithm="ngram")
    got = [
        o.output_ids
        for o in eng.generate(input_ids=prompts, sampling_params=[k1] * 2)
    ]
    assert got == ref
    sched = eng.scheduler
    assert sched.num_spec_steps > 0 and sched.num_spec_accepted > 0
    sched.check_memory_leak()


def test_spec_sampled_mixed_batch():
    """Greedy and sampled rows verify together; the greedy row's output is
    unaffected by its sampled neighbours."""
    rng = np.random.default_rng(1)
    base = rng.integers(1, 100, 5).tolist()
    prompts = [base * 5, (base + [3]) * 4]
    greedy = SamplingParams(temperature=0.0, max_new_tokens=20, ignore_eos=True)
    ref = make_engine().generate(input_ids=prompts[0], sampling_params=greedy)
    eng = make_engine(speculative_algorithm="ngram")
    sampled = SamplingParams(
        temperature=0.9, top_p=0.8, max_new_tokens=20, ignore_eos=True
    )
    outs = eng.generate(
        input_ids=prompts, sampling_params=[greedy, sampled]
    )
    assert outs[0].output_ids == ref.output_ids
    assert len(outs[1].output_ids) == 20
    eng.scheduler.check_memory_leak()


def test_spec_sampled_draft_model():
    """Draft-model speculation with sampled verification (top_k=1 corner):
    same-weight draft proposes the target's greedy chain; with top_k=1 the
    sampled verify must accept everything after warmup."""
    eng = make_engine(
        speculative_algorithm="draft",
        speculative_draft_preset="tiny-debug",
    )
    k1 = SamplingParams(
        temperature=0.5, top_k=1, max_new_tokens=16, ignore_eos=True
    )
    rng = np.random.default_rng(2)
    out = eng.generate(
        input_ids=rng.integers(1, 500, 12).tolist(), sampling_params=k1
    )
    assert len(out.output_ids) == 16
    sched = eng.scheduler
    assert sched.num_spec_accepted > 0
    # same tiny-debug weights: the top_k=1 chain must agree with plain
    # greedy on an equal prompt
    prompt = [11, 12, 13, 14] * 4
    a = eng.generate(input_ids=prompt, sampling_params=k1).output_ids
    b = make_engine().generate(
        input_ids=prompt,
        sampling_params=SamplingParams(
            temperature=0.0, max_new_tokens=16, ignore_eos=True
        ),
    ).output_ids
    assert a == b
    eng.scheduler.check_memory_leak()


def test_eagle_matches_plain_greedy():
    """Random EAGLE head (garbage drafts) must still give exact greedy
    output — verification protects correctness for ANY draft quality."""
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 500, n).tolist() for n in (9, 26)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)

    ref = [
        o.output_ids
        for o in make_engine().generate(
            input_ids=prompts, sampling_params=[sp] * 2
        )
    ]
    eng = make_engine(speculative_algorithm="eagle")
    got = [
        o.output_ids
        for o in eng.generate(input_ids=prompts, sampling_params=[sp] * 2)
    ]
    assert got == ref
    assert eng.scheduler.num_spec_steps > 0  # eagle always proposes
    eng.scheduler.check_memory_leak()


def test_eagle_sampled_topk1_matches_greedy():
    """EAGLE with sampled requests: the sampled verify (with hidden-feature
    capture for draft conditioning) at top_k=1 must equal plain greedy."""
    rng = np.random.default_rng(12)
    prompts = [rng.integers(1, 500, n).tolist() for n in (9, 26)]
    greedy = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)
    ref = [
        o.output_ids
        for o in make_engine().generate(
            input_ids=prompts, sampling_params=[greedy] * 2
        )
    ]
    eng = make_engine(speculative_algorithm="eagle")
    k1 = SamplingParams(
        temperature=0.6, top_k=1, max_new_tokens=16, ignore_eos=True
    )
    got = [
        o.output_ids
        for o in eng.generate(input_ids=prompts, sampling_params=[k1] * 2)
    ]
    assert got == ref
    assert eng.scheduler.num_spec_steps > 0
    eng.scheduler.check_memory_leak()


def test_eagle_multi_turn_and_radix():
    """Repeat prompts (radix hits) keep exactness; plain-decode fallback
    after a sampled request doesn't corrupt later greedy runs."""
    eng = make_engine(speculative_algorithm="eagle")
    ref_eng = make_engine()
    sp = SamplingParams(temperature=0.0, max_new_tokens=10, ignore_eos=True)
    p = [7, 8, 9, 10, 11, 12, 13, 14]
    a = eng.generate(input_ids=p, sampling_params=sp)
    assert a.output_ids == ref_eng.generate(input_ids=p, sampling_params=sp).output_ids
    # sampled request (bypasses speculation, drops features)
    eng.generate(
        input_ids=[3, 4, 5],
        sampling_params=SamplingParams(
            temperature=0.9, max_new_tokens=4, ignore_eos=True
        ),
    )
    # radix-hit rerun still exact
    b = eng.generate(input_ids=p, sampling_params=sp)
    assert b.output_ids == a.output_ids
    assert b.cached_tokens > 0
    eng.scheduler.check_memory_leak()


def test_eagle_head_import_format():
    """Trained EAGLE-1 checkpoints (fc.weight + layers.0.*) import."""
    import jax

    from scratchpad_tpu.executor.eagle import EagleRunner

    eng = make_engine(speculative_algorithm="eagle")
    er = eng.scheduler.eagle
    cfg = eng.model_config
    H, D = cfg.hidden_size, cfg.head_dim
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    rng = np.random.default_rng(0)
    state = {
        "fc.weight": rng.standard_normal((H, 2 * H)).astype(np.float32),
        "layers.0.self_attn.q_proj.weight": rng.standard_normal((Hq * D, H)).astype(np.float32),
        "layers.0.self_attn.k_proj.weight": rng.standard_normal((Hkv * D, H)).astype(np.float32),
        "layers.0.self_attn.v_proj.weight": rng.standard_normal((Hkv * D, H)).astype(np.float32),
        "layers.0.self_attn.o_proj.weight": rng.standard_normal((H, Hq * D)).astype(np.float32),
        "layers.0.mlp.gate_proj.weight": rng.standard_normal((cfg.intermediate_size, H)).astype(np.float32),
        "layers.0.mlp.up_proj.weight": rng.standard_normal((cfg.intermediate_size, H)).astype(np.float32),
        "layers.0.mlp.down_proj.weight": rng.standard_normal((H, cfg.intermediate_size)).astype(np.float32),
        "layers.0.input_layernorm.weight": np.ones(H, np.float32),
        "layers.0.post_attention_layernorm.weight": np.ones(H, np.float32),
    }
    params = er.convert_hf_state(state, jax.numpy.float32)
    assert params["fc"].shape == (2 * H, H)
    assert params["layers"]["wq"].shape == (1, H, Hq * D)
