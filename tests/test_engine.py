"""End-to-end engine tests on a tiny random-weight model (CPU).

Mirrors the reference's e2e strategy (tests/e2e/test_engine.py) but runs the
full stack — scheduler, radix cache, chunked prefill, retraction — on CPU
with token-id prompts (no tokenizer required).
"""

import numpy as np
import pytest

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import get_preset
from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.server.engine import Engine


def make_engine(**kw) -> Engine:
    args = ServerArgs(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=kw.pop("max_total_tokens", 2048),
        chunked_prefill_size=kw.pop("chunked_prefill_size", 256),
        **kw,
    )
    return Engine(args)


@pytest.fixture(scope="module")
def engine():
    return make_engine()


def prompt(n, seed=0):
    return np.random.default_rng(seed).integers(1, 500, n).tolist()


class TestEngineBasics:
    def test_single_greedy(self, engine):
        out = engine.generate(
            input_ids=prompt(10),
            sampling_params=SamplingParams(temperature=0.0, max_new_tokens=8),
        )
        assert len(out.output_ids) == 8
        assert out.finish_reason == "length"
        assert out.prompt_tokens == 10
        engine.scheduler.check_memory_leak()

    def test_batch_mixed_lengths(self, engine):
        prompts = [prompt(n, seed=n) for n in (5, 23, 64, 17)]
        sps = [SamplingParams(temperature=0.0, max_new_tokens=m) for m in (3, 9, 5, 12)]
        outs = engine.generate(input_ids=prompts, sampling_params=sps)
        for o, m in zip(outs, (3, 9, 5, 12)):
            assert len(o.output_ids) == m
        engine.scheduler.check_memory_leak()

    def test_batch_matches_individual(self, engine):
        """Continuous batching must not change greedy results."""
        prompts = [prompt(n, seed=100 + n) for n in (8, 31, 12)]
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        individual = [
            engine.generate(input_ids=p, sampling_params=sp).output_ids
            for p in prompts
        ]
        engine.flush_cache()
        batched = [
            o.output_ids
            for o in engine.generate(
                input_ids=prompts, sampling_params=[sp] * 3
            )
        ]
        assert individual == batched
        engine.flush_cache()

    def test_radix_cache_reuse(self, engine):
        engine.flush_cache()
        p = prompt(40, seed=7)
        sp = SamplingParams(temperature=0.0, max_new_tokens=5)
        a = engine.generate(input_ids=p, sampling_params=sp)
        assert a.cached_tokens == 0
        b = engine.generate(input_ids=p, sampling_params=sp)
        assert b.cached_tokens > 0
        assert a.output_ids == b.output_ids
        # shared prefix, different tail
        c = engine.generate(input_ids=p[:32] + prompt(8, seed=8), sampling_params=sp)
        assert c.cached_tokens >= 28  # at least 7 pages of 4
        engine.scheduler.check_memory_leak()

    def test_stop_token_ids(self, engine):
        p = prompt(10, seed=3)
        sp0 = SamplingParams(temperature=0.0, max_new_tokens=20)
        ref = engine.generate(input_ids=p, sampling_params=sp0)
        stop_at = ref.output_ids[4]
        sp1 = SamplingParams(
            temperature=0.0, max_new_tokens=20, stop_token_ids=[stop_at]
        )
        out = engine.generate(input_ids=p, sampling_params=sp1)
        assert out.output_ids[-1] == stop_at
        assert len(out.output_ids) <= len(ref.output_ids)
        assert out.finish_reason == "stop"

    def test_sampling_nongreedy_runs(self, engine):
        sp = SamplingParams(temperature=0.8, top_p=0.9, top_k=40, max_new_tokens=6)
        out = engine.generate(input_ids=prompt(12, seed=5), sampling_params=sp)
        assert len(out.output_ids) == 6
        engine.scheduler.check_memory_leak()

    def test_logprobs_returned(self, engine):
        sp = SamplingParams(temperature=0.0, max_new_tokens=4)
        out = engine.generate(
            input_ids=prompt(9, seed=11), sampling_params=sp, return_logprob=True
        )
        assert len(out.output_token_logprobs) == 4
        assert all(lp <= 0.0 for lp in out.output_token_logprobs)


class TestChunkedPrefill:
    def test_long_prompt_chunks(self):
        eng = make_engine(chunked_prefill_size=16)
        p = prompt(100, seed=42)
        sp = SamplingParams(temperature=0.0, max_new_tokens=5)
        out = eng.generate(input_ids=p, sampling_params=sp)
        assert len(out.output_ids) == 5
        eng.scheduler.check_memory_leak()
        # equality vs unchunked engine
        eng2 = make_engine(chunked_prefill_size=256)
        out2 = eng2.generate(input_ids=p, sampling_params=sp)
        assert out.output_ids == out2.output_ids

    def test_chunk_respects_input_token_budget(self):
        """When rem_input_tokens runs low, the admitted chunk is SHORTER
        than chunked_prefill_size; the batch build must honor the admitted
        length or the packed token buffer overflows its top bucket
        (regression: 5 x 896-token prompts at max_prefill_tokens=4096)."""
        eng = make_engine(chunked_prefill_size=64, max_prefill_tokens=96)
        prompts = [prompt(56, seed=s) for s in (1, 2, 3)]
        sp = SamplingParams(temperature=0.0, max_new_tokens=4)
        outs = eng.generate(input_ids=prompts, sampling_params=[sp] * 3)
        eng.scheduler.check_memory_leak()
        ref = make_engine()
        refs = ref.generate(input_ids=prompts, sampling_params=[sp] * 3)
        assert [o.output_ids for o in outs] == [o.output_ids for o in refs]

    def test_chunked_with_concurrent(self):
        eng = make_engine(chunked_prefill_size=16)
        prompts = [prompt(n, seed=n) for n in (50, 7, 33)]
        sp = SamplingParams(temperature=0.0, max_new_tokens=4)
        outs = eng.generate(input_ids=prompts, sampling_params=[sp] * 3)
        assert all(len(o.output_ids) == 4 for o in outs)
        eng.scheduler.check_memory_leak()


class TestRetraction:
    def test_memory_pressure_retracts_and_completes(self):
        # 64 tokens of KV: 2 reqs x (16 prompt + 16 out) fills it exactly;
        # 4 concurrent reqs must force retraction yet all finish correctly
        eng = make_engine(max_total_tokens=64, disable_radix_cache=True)
        prompts = [prompt(10, seed=50 + i) for i in range(4)]
        sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
        ref = [
            eng.generate(input_ids=p, sampling_params=sp).output_ids
            for p in prompts
        ]
        outs = eng.generate(input_ids=prompts, sampling_params=[sp] * 4)
        assert [o.output_ids for o in outs] == ref
        eng.scheduler.check_memory_leak()


class TestSchedulePolicies:
    @pytest.mark.parametrize("policy", ["fcfs", "lpm", "lof", "random", "dfs-weight"])
    def test_policies_complete(self, policy):
        eng = make_engine(schedule_policy=policy)
        prompts = [prompt(n, seed=n) for n in (5, 40, 12, 40)]
        sp = SamplingParams(temperature=0.0, max_new_tokens=3)
        outs = eng.generate(input_ids=prompts, sampling_params=[sp] * 4)
        assert all(len(o.output_ids) == 3 for o in outs)
        eng.scheduler.check_memory_leak()


class TestMixedChunk:
    def test_mixed_chunk_matches_plain(self):
        """Decode rows riding in prefill batches must not change results."""
        prompts = [prompt(n, seed=200 + n) for n in (40, 9, 25, 13)]
        sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
        plain = make_engine(chunked_prefill_size=16)
        ref = [
            o.output_ids
            for o in plain.generate(input_ids=prompts, sampling_params=[sp] * 4)
        ]
        mixed = make_engine(chunked_prefill_size=16, enable_mixed_chunk=True)
        got = [
            o.output_ids
            for o in mixed.generate(input_ids=prompts, sampling_params=[sp] * 4)
        ]
        assert got == ref
        mixed.scheduler.check_memory_leak()


class TestOverlapPipeline:
    def test_overlap_matches_plain(self):
        prompts = [prompt(n, seed=300 + n) for n in (12, 30, 8)]
        sp = SamplingParams(temperature=0.0, max_new_tokens=10, ignore_eos=True)
        plain = make_engine()
        ref = [
            o.output_ids
            for o in plain.generate(input_ids=prompts, sampling_params=[sp] * 3)
        ]
        ov = make_engine(enable_overlap=True)
        got = [
            o.output_ids
            for o in ov.generate(input_ids=prompts, sampling_params=[sp] * 3)
        ]
        assert got == ref
        ov.scheduler.check_memory_leak()

    def test_overlap_with_eos_midwindow(self):
        ov = make_engine(enable_overlap=True, decode_window_size=4)
        p = prompt(10, seed=310)
        base = ov.generate(
            input_ids=p,
            sampling_params=SamplingParams(temperature=0.0, max_new_tokens=20),
        )
        stop_tok = base.output_ids[5]
        out = ov.generate(
            input_ids=p,
            sampling_params=SamplingParams(
                temperature=0.0, max_new_tokens=20, stop_token_ids=[stop_tok]
            ),
        )
        assert out.output_ids[-1] == stop_tok
        assert out.output_ids == base.output_ids[:6]
        ov.scheduler.check_memory_leak()

    @pytest.mark.parametrize("depth", [1, 3])
    def test_pipeline_depth_matches_plain(self, depth):
        """Deep pipelines (several windows in flight) are bit-identical to
        the unpipelined schedule, including EOS + budget exhaustion while
        later windows are already dispatched."""
        prompts = [prompt(n, seed=320 + n) for n in (12, 30, 8)]
        sp = SamplingParams(temperature=0.0, max_new_tokens=13, ignore_eos=True)
        plain = make_engine(decode_window_size=4)
        ref = [
            o.output_ids
            for o in plain.generate(input_ids=prompts, sampling_params=[sp] * 3)
        ]
        deep = make_engine(
            enable_overlap=True,
            decode_window_size=4,
            decode_pipeline_depth=depth,
        )
        got = [
            o.output_ids
            for o in deep.generate(input_ids=prompts, sampling_params=[sp] * 3)
        ]
        assert got == ref
        deep.scheduler.check_memory_leak()

    def test_pipeline_depth_eos_midwindow(self):
        deep = make_engine(
            enable_overlap=True, decode_window_size=4, decode_pipeline_depth=3
        )
        p = prompt(10, seed=330)
        base = deep.generate(
            input_ids=p,
            sampling_params=SamplingParams(temperature=0.0, max_new_tokens=20),
        )
        stop_tok = base.output_ids[5]
        out = deep.generate(
            input_ids=p,
            sampling_params=SamplingParams(
                temperature=0.0, max_new_tokens=20, stop_token_ids=[stop_tok]
            ),
        )
        assert out.output_ids[-1] == stop_tok
        first = base.output_ids.index(stop_tok)
        assert out.output_ids == base.output_ids[: first + 1]
        deep.scheduler.check_memory_leak()


class TestAdaptiveDecodeWindow:
    """_pick_decode_window: stream cap, remaining-budget cap, admission."""

    @pytest.fixture(scope="class")
    def sched(self):
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.config.model_config import get_preset
        from scratchpad_tpu.core.scheduler import Scheduler

        args = ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=1024,
            decode_window_size=64,
        )
        return Scheduler(get_preset("tiny-debug", dtype="float32"), args)

    def _req(self, rid, max_new=100, stream=False, out=0):
        from scratchpad_tpu.core.req import Req
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        r = Req(
            rid=rid,
            origin_input_ids=[1, 2, 3],
            sampling_params=SamplingParams(
                max_new_tokens=max_new, temperature=0.0
            ),
        )
        r.stream = stream
        r.output_ids = list(range(out))
        return r

    def test_throughput_batch_gets_full_window(self, sched):
        sched.running = [self._req(f"a{i}") for i in range(4)]
        sched.waiting = []
        assert sched._pick_decode_window() == 64

    def test_stream_caps_window(self, sched):
        sched.running = [self._req("s", stream=True), self._req("b")]
        sched.waiting = []
        assert sched._pick_decode_window() == 8

    def test_remaining_budget_caps_window(self, sched):
        sched.running = [self._req("r", max_new=10, out=7)]
        sched.waiting = []
        assert sched._pick_decode_window() == 2  # rem=3 -> pow2 floor

    def test_admission_pressure_caps_window(self, sched):
        sched.running = [self._req("a")]
        sched.waiting = [self._req("w")]
        assert sched._pick_decode_window() == 4
        sched.waiting = []


class TestAbortMidPipeline:
    def test_abort_with_windows_in_flight(self):
        """abort_request while decode windows are dispatched (depth-3
        pipeline): the aborted request must keep its pages until the
        pipeline drains (in-flight windows still write its KV), then free
        everything; the surviving request finishes normally."""
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.config.model_config import get_preset
        from scratchpad_tpu.core.req import Req
        from scratchpad_tpu.core.scheduler import Scheduler

        cfg = get_preset("tiny-debug", dtype="float32")
        args = ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=1024,
            enable_overlap=True,
            decode_pipeline_depth=3,
            decode_window_size=4,
        )
        sched = Scheduler(cfg, args)
        rng = np.random.default_rng(7)
        for i in range(2):
            sched.add_request(
                Req(
                    rid=f"r{i}",
                    origin_input_ids=rng.integers(1, 500, 10).tolist(),
                    sampling_params=SamplingParams(
                        temperature=0.0, max_new_tokens=40, ignore_eos=True
                    ),
                )
            )
        # run until the pipeline is primed with in-flight windows
        for _ in range(40):
            sched.step()
            if len(sched._inflight) >= 2:
                break
        assert sched._inflight, "pipeline never filled"
        sched.abort_request("r0")
        events = []
        steps = 0
        while sched.has_work() and steps < 200:
            events.extend(sched.step())
            steps += 1
        assert not sched.has_work()
        fins = {e.req.rid: e.req.finished_reason for e in events if e.finished}
        assert str(fins["r0"]).lower().find("abort") >= 0 or fins["r0"] is not None
        assert "r1" in fins
        r1 = next(e.req for e in events if e.finished and e.req.rid == "r1")
        assert len(r1.output_ids) == 40
        sched.check_memory_leak()
