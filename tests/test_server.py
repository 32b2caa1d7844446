"""Black-box HTTP server tests (reference pattern: tests/e2e/test_server.py).

Boots the aiohttp server on a tiny random-weight model in a thread and
drives it with httpx. Token-id mode (no tokenizer): /v1/completions with
token-id prompts.
"""

import asyncio
import json
import socket
import threading
import time

import httpx
import pytest

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.server.engine import Engine
from scratchpad_tpu.server.http_server import ServerApp


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class _ServerThread:
    def __init__(self, args: ServerArgs):
        self.args = args
        self.loop = None
        self.started = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        assert self.started.wait(120), "server failed to start"

    def _run(self):
        from aiohttp import web

        self.loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self.loop)
        engine = Engine(self.args)
        self.app = ServerApp(engine, self.args)
        runner = web.AppRunner(self.app.app)
        self.loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, self.args.host, self.args.port)
        self.loop.run_until_complete(site.start())
        self.started.set()
        self.loop.run_forever()

    def stop(self):
        self.app.runner.shutdown()
        self.loop.call_soon_threadsafe(self.loop.stop)


@pytest.fixture(scope="module")
def server():
    args = ServerArgs(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
        host="127.0.0.1",
        port=_free_port(),
        served_model_name="tiny",
    )
    srv = _ServerThread(args.resolve())
    yield f"http://127.0.0.1:{args.port}"
    srv.stop()


class TestServer:
    def test_health(self, server):
        r = httpx.get(f"{server}/health")
        assert r.status_code == 200

    def test_models(self, server):
        r = httpx.get(f"{server}/v1/models")
        assert r.json()["data"][0]["id"] == "tiny"

    def test_completions_token_ids(self, server):
        r = httpx.post(
            f"{server}/v1/completions",
            json={
                "model": "tiny",
                "prompt": [list(range(1, 12))],
                "max_tokens": 5,
                "temperature": 0.0,
            },
            timeout=120,
        )
        assert r.status_code == 200, r.text
        body = r.json()
        assert body["choices"][0]["finish_reason"] == "length"
        assert body["usage"]["prompt_tokens"] == 11
        assert body["usage"]["completion_tokens"] == 5

    def test_parallel_requests(self, server):
        with httpx.Client(timeout=120) as c:
            reqs = [
                c.post(
                    f"{server}/v1/completions",
                    json={
                        "model": "tiny",
                        "prompt": [list(range(1, 8 + i))],
                        "max_tokens": 4,
                        "temperature": 0.0,
                    },
                )
                for i in range(4)
            ]
        assert all(r.status_code == 200 for r in reqs)

    def test_streaming(self, server):
        with httpx.stream(
            "POST",
            f"{server}/v1/completions",
            json={
                "model": "tiny",
                "prompt": [list(range(1, 10))],
                "max_tokens": 4,
                "temperature": 0.0,
                "stream": True,
            },
            timeout=120,
        ) as r:
            assert r.status_code == 200
            events = []
            for line in r.iter_lines():
                if line.startswith("data: "):
                    events.append(line[6:])
        assert events[-1] == "[DONE]"
        final = json.loads(events[-2])
        assert final["choices"][0]["finish_reason"] == "length"
        assert final["usage"]["completion_tokens"] == 4

    def test_system_info_and_metrics(self, server):
        r = httpx.get(f"{server}/system_info")
        assert r.status_code == 200
        assert r.json()["kv_pages_total"] > 0
        r = httpx.get(f"{server}/metrics")
        assert r.status_code == 200
        assert b"scratchpad_tpu:token_usage" in r.content

    def test_latency_histograms_populated(self, server):
        """TTFT/ITL/TPOT/E2E histograms fill from served requests
        (VERDICT r2 item 5; reference: server/metrics.py:38-125)."""
        r = httpx.post(
            f"{server}/v1/completions",
            json={
                "model": "tiny-debug",
                "prompt": [5, 6, 7, 8],
                "max_tokens": 8,
                "temperature": 0.0,
                "ignore_eos": True,
            },
            timeout=60,
        )
        assert r.status_code == 200
        text = httpx.get(f"{server}/metrics").text

        def bucket_count(metric):
            tot = 0.0
            for line in text.splitlines():
                if line.startswith(f"scratchpad_tpu:{metric}_count"):
                    tot += float(line.split()[-1])
            return tot

        assert bucket_count("time_to_first_token_seconds") >= 1
        assert bucket_count("e2e_request_latency_seconds") >= 1
        assert bucket_count("time_per_output_token_seconds") >= 1
        assert bucket_count("inter_token_latency_seconds") >= 1
        assert "scratchpad_tpu:generation_tokens_total" in text
        assert 'scratchpad_tpu:num_finished_reqs_total{reason="length"}' in text

    def test_bad_request(self, server):
        r = httpx.post(
            f"{server}/v1/completions", json={"model": "tiny"}, timeout=30
        )
        assert r.status_code == 400

    def test_chat_completions_fallback_template(self, server):
        # no tokenizer -> chat requires one; expect a clean 400, not a crash
        r = httpx.post(
            f"{server}/v1/chat/completions",
            json={
                "model": "tiny",
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4,
            },
            timeout=60,
        )
        assert r.status_code in (200, 400)

    def test_embeddings_endpoint(self, server):
        r = httpx.post(
            f"{server}/v1/embeddings",
            json={"model": "tiny", "input": [[1, 2, 3, 4, 5]]},
            timeout=60,
        )
        assert r.status_code == 200, r.text
        data = r.json()["data"]
        assert len(data) == 1 and len(data[0]["embedding"]) == 128

    def test_files_and_batches(self, server):
        import io

        lines = "\n".join(
            json.dumps(
                {
                    "custom_id": f"r{i}",
                    "body": {
                        "model": "tiny",
                        "prompt": [list(range(1, 8 + i))],
                        "max_tokens": 3,
                        "temperature": 0.0,
                    },
                }
            )
            for i in range(3)
        )
        r = httpx.post(
            f"{server}/v1/files",
            files={"file": ("batch.jsonl", io.BytesIO(lines.encode()))},
            data={"purpose": "batch"},
            timeout=30,
        )
        assert r.status_code == 200, r.text
        fid = r.json()["id"]
        r = httpx.post(
            f"{server}/v1/batches",
            json={"input_file_id": fid, "endpoint": "/v1/completions"},
            timeout=30,
        )
        assert r.status_code == 200, r.text
        bid = r.json()["id"]
        for _ in range(60):
            b = httpx.get(f"{server}/v1/batches/{bid}", timeout=30).json()
            if b["status"] == "completed":
                break
            time.sleep(1)
        assert b["status"] == "completed", b
        assert b["request_counts"]["completed"] == 3
        out = httpx.get(
            f"{server}/v1/files/{b['output_file_id']}/content", timeout=30
        )
        results = [json.loads(x) for x in out.text.strip().splitlines()]
        assert {r["custom_id"] for r in results} == {"r0", "r1", "r2"}
        assert all(r["response"]["status_code"] == 200 for r in results)


class TestEchoPromptLogprobs:
    """echo + logprobs returns prompt-token logprobs (the lm-eval
    loglikelihood primitive served over HTTP)."""

    def test_echo_scoring(self, server):
        ids = [5, 6, 7, 8, 9, 10]
        r = httpx.post(
            f"{server}/v1/completions",
            json={
                "model": "tiny",
                "prompt": [ids],
                "max_tokens": 0,
                "temperature": 0.0,
                "echo": True,
                "logprobs": 1,
            },
            timeout=120,
        )
        assert r.status_code == 200, r.text
        lp = r.json()["choices"][0]["logprobs"]
        assert lp["token_logprobs"][0] is None
        vals = lp["token_logprobs"][1:]
        assert len(vals) == len(ids) - 1
        assert all(isinstance(v, float) and v <= 0.0 for v in vals)
        assert lp["tokens"][: len(ids)] == [str(t) for t in ids]

    def test_echo_scoring_with_generation(self, server):
        ids = [5, 6, 7, 8]
        r = httpx.post(
            f"{server}/v1/completions",
            json={
                "model": "tiny",
                "prompt": [ids],
                "max_tokens": 3,
                "temperature": 0.0,
                "ignore_eos": True,
                "echo": True,
                "logprobs": 1,
            },
            timeout=120,
        )
        assert r.status_code == 200, r.text
        lp = r.json()["choices"][0]["logprobs"]
        # [None, 3 prompt lps, 3 output lps]
        assert len(lp["token_logprobs"]) == 1 + 3 + 3
        assert len(lp["tokens"]) == 4 + 3

    def test_scoring_under_load(self, server):
        """Scoring requests interleave with generation without deadlock."""
        import concurrent.futures as cf

        def gen():
            return httpx.post(
                f"{server}/v1/completions",
                json={
                    "model": "tiny",
                    "prompt": [[1, 2, 3, 4, 5]],
                    "max_tokens": 8,
                    "temperature": 0.0,
                    "ignore_eos": True,
                },
                timeout=120,
            ).status_code

        def score():
            return httpx.post(
                f"{server}/v1/completions",
                json={
                    "model": "tiny",
                    "prompt": [[7, 8, 9, 10]],
                    "max_tokens": 0,
                    "echo": True,
                    "logprobs": 1,
                },
                timeout=120,
            ).status_code

        with cf.ThreadPoolExecutor(8) as ex:
            futs = [ex.submit(gen) for _ in range(4)] + [
                ex.submit(score) for _ in range(4)
            ]
            assert all(f.result() == 200 for f in futs)


def test_dashboard_served(server):
    import httpx

    r = httpx.get(f"{server}/")
    assert r.status_code == 200
    assert "text/html" in r.headers["content-type"]
    assert "scratchpad-tpu" in r.text and "/metrics" in r.text
