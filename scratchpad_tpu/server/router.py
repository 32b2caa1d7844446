"""Data-parallel front-end router.

The reference threads dp_size/load_balance_method flags through its workers
but ships no router process (SURVEY §2.7); this closes that gap: an aiohttp
reverse proxy spreading OpenAI-API requests over N engine replicas.

Policies: least-requests (default), round-robin, random, and cache-aware —
the router mirrors each replica's likely radix-cache contents with an
approximate prefix index and sends a request to the replica holding the
longest matching prefix (falling back to least-requests when no replica
matches meaningfully or the best match is overloaded). Unhealthy replicas
are ejected until their /health recovers.
"""

from __future__ import annotations

import asyncio
import itertools
import json
import random
import time
from collections import OrderedDict
from typing import Optional

import aiohttp
from aiohttp import web

from scratchpad_tpu.utils import get_logger

logger = get_logger("router")


class PrefixIndex:
    """Approximate mirror of one replica's radix cache.

    Prompts are chunked into fixed-size blocks and every prefix-of-blocks
    hash is remembered (LRU-bounded). ``match(key)`` returns the number of
    leading blocks some remembered prompt shares with ``key`` — an O(len)
    stand-in for walking the replica's real radix tree, which the router
    cannot see."""

    BLOCK = 32  # characters per block

    def __init__(self, max_entries: int = 16384):
        self.seen: OrderedDict[int, None] = OrderedDict()
        self.max_entries = max_entries

    def _prefix_hashes(self, key: str):
        for end in range(self.BLOCK, len(key) + 1, self.BLOCK):
            yield hash(key[:end])

    def insert(self, key: str) -> None:
        for h in self._prefix_hashes(key):
            if h in self.seen:
                self.seen.move_to_end(h)
            else:
                self.seen[h] = None
        while len(self.seen) > self.max_entries:
            self.seen.popitem(last=False)

    def match(self, key: str) -> int:
        n = 0
        for h in self._prefix_hashes(key):
            if h not in self.seen:
                break
            n += 1
        return n


class Replica:
    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")
        self.outstanding = 0
        self.healthy = True
        self.last_check = 0.0
        self.prefix_index = PrefixIndex()
        self.routed = 0
        self.cache_hits = 0


class Router:
    def __init__(self, replicas: list[str], policy: str = "least"):
        self.replicas = [Replica(u) for u in replicas]
        self.policy = policy
        self._rr = itertools.count()
        self._rng = random.Random(0)
        self.app = web.Application()
        self.app.router.add_get("/health", self.health)
        self.app.router.add_get("/router_info", self.info)
        self.app.router.add_route("*", "/{tail:.*}", self.proxy)
        self._session: Optional[aiohttp.ClientSession] = None
        self.app.on_startup.append(self._startup)
        self.app.on_cleanup.append(self._cleanup)

    async def _startup(self, app) -> None:
        self._session = aiohttp.ClientSession()
        self._hc = asyncio.create_task(self._health_loop())

    async def _cleanup(self, app) -> None:
        self._hc.cancel()
        await self._session.close()

    async def _health_loop(self) -> None:
        while True:
            await asyncio.sleep(5)
            for r in self.replicas:
                try:
                    async with self._session.get(
                        f"{r.base_url}/health",
                        timeout=aiohttp.ClientTimeout(total=3),
                    ) as resp:
                        r.healthy = resp.status == 200
                except Exception:
                    r.healthy = False
                r.last_check = time.monotonic()

    # cache-aware knobs: route on affinity only when the match is at least
    # MIN_MATCH_BLOCKS deep AND the target isn't much busier than the
    # least-loaded replica (affinity must not defeat load balancing)
    MIN_MATCH_BLOCKS = 2
    MAX_IMBALANCE = 8

    def _pick(self, key: Optional[str] = None) -> Replica:
        live = [r for r in self.replicas if r.healthy] or self.replicas
        if self.policy == "round-robin":
            return live[next(self._rr) % len(live)]
        if self.policy == "random":
            return self._rng.choice(live)
        least = min(live, key=lambda r: r.outstanding)
        if self.policy == "cache-aware" and key:
            best = max(live, key=lambda r: r.prefix_index.match(key))
            depth = best.prefix_index.match(key)
            if (
                depth >= self.MIN_MATCH_BLOCKS
                and best.outstanding <= least.outstanding + self.MAX_IMBALANCE
            ):
                best.cache_hits += 1
                return best
        return least  # least-requests

    @staticmethod
    def _request_key(tail: str, body: bytes) -> Optional[str]:
        """Canonical prompt-prefix string for cache-affinity routing."""
        if not body or not tail.startswith("v1/"):
            return None
        try:
            payload = json.loads(body)
        except Exception:
            return None
        if "messages" in payload:
            parts = []
            for m in payload["messages"]:
                c = m.get("content")
                if isinstance(c, list):  # multimodal parts
                    c = "".join(
                        p.get("text", "") for p in c if isinstance(p, dict)
                    )
                parts.append(f"{m.get('role', '')}:{c}")
            return "\x1e".join(parts)
        prompt = payload.get("prompt")
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], list):
            prompt = prompt[0]  # batched: route on the first item
        if isinstance(prompt, list):
            return ",".join(map(str, prompt))
        return prompt if isinstance(prompt, str) else None

    async def health(self, request) -> web.Response:
        return web.json_response(
            {"healthy": sum(r.healthy for r in self.replicas)}
        )

    async def info(self, request) -> web.Response:
        return web.json_response(
            {
                "policy": self.policy,
                "replicas": [
                    {
                        "url": r.base_url,
                        "healthy": r.healthy,
                        "outstanding": r.outstanding,
                        "routed": r.routed,
                        "cache_hits": r.cache_hits,
                    }
                    for r in self.replicas
                ],
            }
        )

    async def proxy(self, request) -> web.StreamResponse:
        tail = request.match_info["tail"]
        body = await request.read()
        key = (
            self._request_key(tail, body)
            if self.policy == "cache-aware"
            else None
        )
        replica = self._pick(key)
        replica.routed += 1
        if key:
            replica.prefix_index.insert(key)
        url = f"{replica.base_url}/{tail}"
        if request.query_string:
            url += f"?{request.query_string}"
        replica.outstanding += 1
        try:
            async with self._session.request(
                request.method,
                url,
                data=body if body else None,
                headers={
                    k: v
                    for k, v in request.headers.items()
                    if k.lower() not in ("host", "content-length")
                },
                timeout=aiohttp.ClientTimeout(total=600),
            ) as upstream:
                resp = web.StreamResponse(
                    status=upstream.status, headers=upstream.headers.copy()
                )
                resp.headers.pop("Transfer-Encoding", None)
                resp.headers.pop("Content-Length", None)
                await resp.prepare(request)
                async for chunk in upstream.content.iter_any():
                    await resp.write(chunk)
                await resp.write_eof()
                return resp
        except Exception as e:  # noqa: BLE001
            logger.warning("proxy to %s failed: %s", replica.base_url, e)
            return web.json_response({"error": str(e)}, status=502)
        finally:
            replica.outstanding -= 1


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", nargs="+", required=True)
    ap.add_argument("--policy", default="least", choices=["least", "round-robin", "random", "cache-aware"])
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=3100)
    args = ap.parse_args()
    router = Router(args.replicas, args.policy)
    web.run_app(router.app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
