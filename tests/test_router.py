"""DP router: proxies OpenAI requests over replicas, balances, survives death."""

import asyncio
import socket
import threading

import httpx
import pytest

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.server.engine import Engine
from scratchpad_tpu.server.http_server import ServerApp
from scratchpad_tpu.server.router import Router


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class _LoopThread:
    """Run an aiohttp app in a dedicated loop thread."""

    def __init__(self, app, port):
        from aiohttp import web

        self.port = port
        self.started = threading.Event()

        def run():
            self.loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self.loop)
            runner = web.AppRunner(app)
            self.loop.run_until_complete(runner.setup())
            site = web.TCPSite(runner, "127.0.0.1", port)
            self.loop.run_until_complete(site.start())
            self.started.set()
            self.loop.run_forever()

        self.thread = threading.Thread(target=run, daemon=True)
        self.thread.start()
        assert self.started.wait(120)


@pytest.fixture(scope="module")
def cluster():
    args_common = dict(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=1024,
        served_model_name="tiny",
    )
    ports = [_free_port(), _free_port()]
    for p in ports:
        args = ServerArgs(host="127.0.0.1", port=p, **args_common).resolve()
        _LoopThread(ServerApp(Engine(args), args).app, p)
    rport = _free_port()
    router = Router([f"http://127.0.0.1:{p}" for p in ports], policy="round-robin")
    _LoopThread(router.app, rport)
    return f"http://127.0.0.1:{rport}", router


def test_router_proxies_and_balances(cluster):
    url, router = cluster
    results = []
    for i in range(4):
        r = httpx.post(
            f"{url}/v1/completions",
            json={
                "model": "tiny",
                "prompt": [list(range(1, 10 + i))],
                "max_tokens": 3,
                "temperature": 0.0,
            },
            timeout=120,
        )
        assert r.status_code == 200, r.text
        results.append(r.json())
    assert all(x["usage"]["completion_tokens"] == 3 for x in results)
    info = httpx.get(f"{url}/router_info", timeout=30).json()
    assert len(info["replicas"]) == 2


def test_router_health(cluster):
    url, _ = cluster
    r = httpx.get(f"{url}/health", timeout=30)
    assert r.status_code == 200


def test_prefix_index_and_request_key():
    from scratchpad_tpu.server.router import PrefixIndex, Router

    idx = PrefixIndex()
    idx.insert("a" * 100)
    assert idx.match("a" * 100) == 3  # 3 full 32-char blocks
    assert idx.match("a" * 64 + "b" * 36) == 2  # diverges in block 3
    assert idx.match("b" * 100) == 0
    # LRU bound
    small = PrefixIndex(max_entries=2)
    small.insert("x" * 96)
    assert len(small.seen) == 2

    key = Router._request_key(
        "v1/completions", b'{"prompt": [1, 2, 3], "max_tokens": 1}'
    )
    assert key == "1,2,3"
    key = Router._request_key(
        "v1/chat/completions",
        b'{"messages": [{"role": "user", "content": "hi"}]}',
    )
    assert key == "user:hi"
    assert Router._request_key("health", b"") is None


def test_cache_aware_affinity(cluster):
    """Same long prompt routes to the SAME replica; distinct prompts spread
    by load."""
    url, _ = cluster
    from scratchpad_tpu.server.router import Router

    import httpx

    # stand up a second router (cache-aware) over the same replicas
    reps = [r["url"] for r in httpx.get(f"{url}/router_info").json()["replicas"]]
    rport = _free_port()
    router = Router(reps, policy="cache-aware")
    _LoopThread(router.app, rport)
    curl = f"http://127.0.0.1:{rport}"

    shared = list(range(1, 40))  # long enough for >= 2 key blocks
    for _ in range(3):
        r = httpx.post(
            f"{curl}/v1/completions",
            json={
                "model": "tiny",
                "prompt": [shared],
                "max_tokens": 2,
                "temperature": 0.0,
            },
            timeout=120,
        )
        assert r.status_code == 200, r.text
    info = httpx.get(f"{curl}/router_info", timeout=30).json()
    routed = [x["routed"] for x in info["replicas"]]
    hits = sum(x["cache_hits"] for x in info["replicas"])
    # repeats 2 and 3 must follow repeat 1's replica
    assert sorted(routed) == [0, 3], info
    assert hits == 2, info
