"""Per-request custom logit processors end-to-end (VERDICT r2 item 6;
reference: scratchpad/sampling/custom_logit_processor.py:1-38, applied at
nn/layers/sampler.py:162)."""

import numpy as np
import pytest

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.sampling.custom_logit_processor import (
    BannedTokensProcessor,
    CustomLogitProcessor,
)
from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.server.engine import Engine


def make_engine(**kw):
    return Engine(
        ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
            **kw,
        )
    )


class ShiftByParamProcessor(CustomLogitProcessor):
    """Adds params["boost"] to one fixed token id — exercises custom_params."""

    def __init__(self, token_id: int):
        self.token_id = int(token_id)

    def __call__(self, logits, params):
        import jax.numpy as jnp

        boost = params["boost"]  # f32[B]
        return logits.at[:, self.token_id].add(boost)

    def __hash__(self):
        return hash((type(self).__name__, self.token_id))

    def __eq__(self, other):
        return type(other) is type(self) and other.token_id == self.token_id


def test_banned_tokens_change_greedy_output():
    eng = make_engine()
    prompt = [7, 8, 9, 10, 11]
    base = eng.generate(
        input_ids=prompt,
        sampling_params=SamplingParams(temperature=0.0, max_new_tokens=6),
    ).output_ids
    banned = BannedTokensProcessor(base)  # ban everything it would say
    out = eng.generate(
        input_ids=prompt,
        sampling_params=SamplingParams(
            temperature=0.0,
            max_new_tokens=6,
            custom_logit_processor=banned,
        ),
    ).output_ids
    assert len(out) == 6
    assert not set(out) & set(base)
    eng.scheduler.check_memory_leak()


def test_custom_params_per_row():
    """Two requests share ONE processor object with different per-row
    params; a huge boost forces that token id greedily."""
    eng = make_engine()
    proc = ShiftByParamProcessor(token_id=123)
    sps = [
        SamplingParams(
            temperature=0.0,
            max_new_tokens=3,
            custom_logit_processor=proc,
            custom_params={"boost": 1e9},
        ),
        SamplingParams(temperature=0.0, max_new_tokens=3),
    ]
    outs = eng.generate(
        input_ids=[[5, 6, 7], [5, 6, 7]], sampling_params=sps
    )
    assert outs[0].output_ids == [123, 123, 123]
    assert outs[1].output_ids != [123, 123, 123]
    eng.scheduler.check_memory_leak()


def test_mixed_batch_unaffected_rows():
    """Rows without a processor in the same batch are untouched."""
    eng = make_engine()
    plain = SamplingParams(temperature=0.0, max_new_tokens=4)
    ref = eng.generate(input_ids=[1, 2, 3, 4], sampling_params=plain).output_ids
    outs = eng.generate(
        input_ids=[[1, 2, 3, 4], [9, 8, 7]],
        sampling_params=[
            plain,
            SamplingParams(
                temperature=0.0,
                max_new_tokens=4,
                custom_logit_processor=BannedTokensProcessor([1, 2, 3]),
            ),
        ],
    )
    assert outs[0].output_ids == ref
    eng.scheduler.check_memory_leak()


class TestServerAPI:
    def _serve(self, enable: bool):
        from tests.test_server import _ServerThread, _free_port

        args = ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
            host="127.0.0.1",
            port=_free_port(),
            enable_custom_logit_processor=enable,
        )
        return _ServerThread(args), f"http://127.0.0.1:{args.port}"

    def test_http_gate_and_effect(self):
        import httpx

        srv, url = self._serve(enable=True)
        try:
            body = {
                "model": "tiny-debug",
                "prompt": [5, 6, 7, 8],
                "max_tokens": 5,
                "temperature": 0.0,
                "ignore_eos": True,
                "logprobs": 1,
            }
            base = httpx.post(
                f"{url}/v1/completions", json=body, timeout=60
            ).json()["choices"][0]["logprobs"]["tokens"]
            banned = BannedTokensProcessor([int(t) for t in base])
            body["custom_logit_processor"] = banned.to_str()
            r = httpx.post(f"{url}/v1/completions", json=body, timeout=60)
            assert r.status_code == 200
            got = r.json()["choices"][0]["logprobs"]["tokens"]
            assert not set(got) & set(base)
        finally:
            srv.stop()

    def test_http_rejected_without_flag(self):
        import httpx

        srv, url = self._serve(enable=False)
        try:
            r = httpx.post(
                f"{url}/v1/completions",
                json={
                    "model": "tiny-debug",
                    "prompt": [5, 6, 7],
                    "max_tokens": 2,
                    "custom_logit_processor": BannedTokensProcessor(
                        [1]
                    ).to_str(),
                },
                timeout=60,
            )
            assert r.status_code == 400
            assert "enable-custom-logit-processor" in r.text
        finally:
            srv.stop()
