"""Cross-host serving on a 2-process CPU "cluster".

Two OS processes bootstrap jax.distributed over a local coordinator and
form one 8-device global mesh (dp=2 across the process boundary, tp=4
within each); the leader serves, followers replay the runner command
stream (parallel/multihost.py). Greedy outputs must equal the
single-process engine's. The reference never tests multi-node without
hardware (SURVEY.md §4); this runs in CI on CPU.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.server.engine import Engine

DRIVER = Path(__file__).parent / "multihost_driver.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(variant: str):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    root = str(DRIVER.parent.parent)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    coord, ctrl = _free_port(), _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), str(r), "2", str(coord), str(ctrl),
             variant],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(DRIVER.parent.parent),
        )
        for r in (0, 1)
    ]
    try:
        out0, _ = procs[0].communicate(timeout=600)
        out1, _ = procs[1].communicate(timeout=120)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    assert procs[0].returncode == 0, f"leader failed:\n{out0[-4000:]}"
    assert procs[1].returncode == 0, f"follower failed:\n{out1[-4000:]}"
    line = [l for l in out0.splitlines() if l.startswith("RESULT ")]
    assert line, out0[-4000:]
    return json.loads(line[-1][len("RESULT ") :])


def _reference(variant: str):
    kw = dict(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
    )
    if variant == "hostkv":
        kw.update(host_kv_cache_tokens=4096, max_total_tokens=256)
    eng = Engine(ServerArgs(**kw))
    rng = np.random.default_rng(0)
    if variant == "hostkv":
        # single-process mirror of the driver's evict->offload->promote run
        sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
        pa = rng.integers(1, 500, 96).tolist()
        first = eng.generate(input_ids=pa, sampling_params=sp)
        for seed in range(3):
            filler = np.random.default_rng(10 + seed).integers(1, 500, 96)
            eng.generate(input_ids=filler.tolist(), sampling_params=sp)
        again = eng.generate(input_ids=pa, sampling_params=sp)
        return [first.output_ids, again.output_ids]
    if variant == "ngram":
        base = rng.integers(1, 100, 6).tolist()
        prompts = [base * 4, (base + [7]) * 3, rng.integers(1, 500, 14).tolist()]
    else:
        prompts = [rng.integers(1, 500, n).tolist() for n in (9, 25, 14)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    toppings = None
    if variant == "toppings":
        from test_toppings import make_lora_state

        state = make_lora_state(eng.model_config, rank=4, seed=10)
        eng.register_topping("ad1", state=state, scaling=0.5)
        toppings = ["ad1", None, "ad1"]
    return [
        o.output_ids
        for o in eng.generate(
            input_ids=prompts, sampling_params=[sp] * 3, topping=toppings
        )
    ]


@pytest.mark.slow
def test_two_process_engine_matches_single():
    assert _run_pair("plain") == _reference("plain")


@pytest.mark.slow
def test_two_process_draft_spec_matches_single():
    """Draft-model speculation across the cluster: followers build the
    mirrored draft runner and replay its "draft:" command stream. With
    draft == target, acceptance is 100% and outputs equal plain decode."""
    assert _run_pair("draftspec") == _reference("plain")


@pytest.mark.slow
def test_two_process_eagle_spec_matches_single():
    """EAGLE speculation across the cluster: the head's write_pairs/propose
    calls relay as "eagle:"; exact greedy verification keeps outputs equal
    to plain decode regardless of the (random) head's acceptance rate."""
    assert _run_pair("eagle") == _reference("plain")


@pytest.mark.slow
def test_two_process_topping_registration_matches_single():
    """Runtime LoRA registration relays the loaded numpy state to the
    follower before any batch references the adapter slot."""
    assert _run_pair("toppings") == _reference("toppings")


@pytest.mark.slow
def test_two_process_ngram_spec_matches_single():
    """ngram speculative decoding across the 2-process cluster: drafts are
    host-computed on the leader; verification replays on every node."""
    assert _run_pair("ngram") == _reference("ngram")


@pytest.mark.slow
def test_two_process_host_kv_tier_matches_single():
    """Host KV tier across the cluster: radix eviction offloads pages via a
    replicated gather_pages collective (full pages on every host), and
    promotion broadcasts the page data through scatter_pages. The driver
    asserts stored/restored counters; outputs must equal single-process."""
    assert _run_pair("hostkv") == _reference("hostkv")


@pytest.mark.slow
def test_two_process_overlap_matches_single():
    """Window pipelining across the cluster: the follower's pending-window
    FIFO must stay in lockstep with the leader's chained dispatch/fetch
    interleaving."""
    assert _run_pair("overlap") == _reference("plain")
