"""Subprocess driver for the cross-host serving test (tests/test_multihost.py).

Run as: python multihost_driver.py <node_rank> <num_nodes> <coord_port> <ctrl_port>
The parent sets XLA_FLAGS=--xla_force_host_platform_device_count=4 so the
2-process run forms an 8-device global CPU mesh (dp=2 over the process
boundary x tp=4 inside each process).
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.sampling.sampling_params import SamplingParams


def main() -> None:
    rank, nodes, coord_port, ctrl_port = map(int, sys.argv[1:5])
    variant = sys.argv[5] if len(sys.argv) > 5 else "plain"
    extra = {}
    if variant == "ngram":
        extra = dict(speculative_algorithm="ngram")
    elif variant == "overlap":
        extra = dict(enable_overlap=True, decode_window_size=4)
    elif variant == "draftspec":
        # target == draft (same preset, same seed) -> 100% acceptance; the
        # follower builds the mirrored draft runner and replays "draft:*"
        extra = dict(
            speculative_algorithm="draft", speculative_draft_preset="tiny-debug"
        )
    elif variant == "eagle":
        # random-init EAGLE head (seeded identically on every node);
        # verification is exact greedy so outputs match plain decode
        extra = dict(speculative_algorithm="eagle")
    elif variant == "hostkv":
        # tiny device pool forces radix eviction into the host tier; the
        # follower replays gather/scatter_pages as replicated collectives
        extra = dict(host_kv_cache_tokens=4096, max_total_tokens=256)
    kw = dict(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
        num_nodes=nodes,
        node_rank=rank,
        dist_init_addr=f"127.0.0.1:{coord_port}",
        control_plane_addr=f"127.0.0.1:{ctrl_port}",
        dp_size=2,
        tp_size=4,
        device="cpu",
    )
    kw.update(extra)
    args = ServerArgs(**kw)
    if rank > 0:
        from scratchpad_tpu.server.engine import run_follower

        run_follower(args)
        return

    from scratchpad_tpu.server.engine import Engine

    eng = Engine(args)
    rng = np.random.default_rng(0)
    if variant == "hostkv":
        # evict -> offload -> promote, same workload as
        # tests/test_memory.py::TestHostKVTier but across two processes
        sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
        pa = rng.integers(1, 500, 96).tolist()
        first = eng.generate(input_ids=pa, sampling_params=sp)
        for seed in range(3):
            filler = np.random.default_rng(10 + seed).integers(1, 500, 96)
            eng.generate(input_ids=filler.tolist(), sampling_params=sp)
        tier = eng.scheduler.host_tier
        assert tier.stored_pages > 0, "nothing offloaded to the host tier"
        again = eng.generate(input_ids=pa, sampling_params=sp)
        assert tier.restored_pages > 0, "no host pages promoted back"
        assert again.cached_tokens > 0
        eng.scheduler.check_memory_leak()
        eng.shutdown()
        print("RESULT " + json.dumps([first.output_ids, again.output_ids]))
        return
    if variant == "ngram":
        # repetitive prompts so prompt-lookup drafts actually fire
        base = rng.integers(1, 100, 6).tolist()
        prompts = [base * 4, (base + [7]) * 3, rng.integers(1, 500, 14).tolist()]
    else:
        prompts = [rng.integers(1, 500, n).tolist() for n in (9, 25, 14)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    toppings = None
    if variant == "toppings":
        # runtime LoRA registration relays to the follower; rows mix
        # adapter and base requests in one batch
        from test_toppings import make_lora_state

        state = make_lora_state(eng.model_config, rank=4, seed=10)
        eng.register_topping("ad1", state=state, scaling=0.5)
        toppings = ["ad1", None, "ad1"]
    outs = [
        o.output_ids
        for o in eng.generate(
            input_ids=prompts, sampling_params=[sp] * 3, topping=toppings
        )
    ]
    eng.scheduler.check_memory_leak()
    eng.shutdown()
    print("RESULT " + json.dumps(outs))


if __name__ == "__main__":
    main()
