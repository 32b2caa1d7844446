"""Scheduler stress fuzz: mixed workloads under memory pressure.

The strongest invariant this engine offers: greedy outputs are identical no
matter how scheduling interleaves (batching, chunking, retraction, radix
reuse, windows, pipelining) — and no page/slot ever leaks.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.server.engine import Engine


def build(seed, n_reqs, rng):
    prompts, sps = [], []
    for i in range(n_reqs):
        plen = int(rng.integers(2, 60))
        prompts.append(rng.integers(1, 500, plen).tolist())
        sps.append(
            SamplingParams(
                temperature=0.0,
                max_new_tokens=int(rng.integers(1, 12)),
                ignore_eos=bool(rng.random() < 0.5),
                stop_token_ids=(
                    [int(rng.integers(1, 500))] if rng.random() < 0.3 else None
                ),
            )
        )
    return prompts, sps


@pytest.mark.parametrize(
    "cfg",
    [
        dict(),  # default
        dict(max_total_tokens=256, disable_radix_cache=True),  # heavy pressure
        dict(chunked_prefill_size=8),  # extreme chunking
        dict(enable_mixed_chunk=True, chunked_prefill_size=16),
        dict(enable_overlap=True, decode_window_size=4),
        dict(schedule_policy="dfs-weight"),
        dict(attention_backend="gqa", kv_cache_dtype="int8"),
    ],
    ids=["default", "pressure", "tiny-chunks", "mixed", "overlap", "dfs",
         "gqa-int8"],
)
def test_fuzz_matches_solo(cfg):
    rng = np.random.default_rng(hash(str(sorted(cfg.items()))) % 2**32)
    args = dict(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
        chunked_prefill_size=64,
    )
    args.update(cfg)
    eng = Engine(ServerArgs(**args))
    prompts, sps = build(0, 10, rng)
    # ground truth: each request alone on a fresh-cache engine
    solo = []
    for p, s in zip(prompts, sps):
        solo.append(eng.generate(input_ids=p, sampling_params=s).output_ids)
        eng.flush_cache()
    # staggered submission: half first, then the rest mid-flight
    sched = eng.scheduler
    reqs = [
        eng._make_req(None, p, s) for p, s in zip(prompts, sps)
    ]
    for r in reqs[:5]:
        sched.add_request(r)
    steps = 0
    added = 5
    while (sched.has_work() or added < len(reqs)) and steps < 500:
        if steps % 3 == 1 and added < len(reqs):
            sched.add_request(reqs[added])
            added += 1
        sched.step()
        steps += 1
    sched.drain()
    assert all(r.finished() for r in reqs), [r.rid for r in reqs if not r.finished()]
    got = [r.output_ids for r in reqs]
    assert got == solo
    sched.check_memory_leak()
