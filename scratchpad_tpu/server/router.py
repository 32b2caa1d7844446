"""Data-parallel front-end router.

The reference threads dp_size/load_balance_method flags through its workers
but ships no router process (SURVEY §2.7); this closes that gap: an aiohttp
reverse proxy spreading OpenAI-API requests over N engine replicas.

Policies: least-requests (default), round-robin, random. Unhealthy replicas
are ejected until their /health recovers.
"""

from __future__ import annotations

import asyncio
import itertools
import random
import time
from typing import Optional

import aiohttp
from aiohttp import web

from scratchpad_tpu.utils import get_logger

logger = get_logger("router")


class Replica:
    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")
        self.outstanding = 0
        self.healthy = True
        self.last_check = 0.0


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

    def _pick(self) -> Replica:
        live = [r for r in self.replicas if r.healthy] or self.replicas
        if self.policy == "round-robin":
            return live[next(self._rr) % len(live)]
        if self.policy == "random":
            return self._rng.choice(live)
        return min(live, key=lambda r: r.outstanding)  # least-requests

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
                    }
                    for r in self.replicas
                ],
            }
        )

    async def proxy(self, request) -> web.StreamResponse:
        replica = self._pick()
        url = f"{replica.base_url}/{request.match_info['tail']}"
        if request.query_string:
            url += f"?{request.query_string}"
        replica.outstanding += 1
        try:
            body = await request.read()
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
    ap.add_argument("--policy", default="least", choices=["least", "round-robin", "random"])
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=3100)
    args = ap.parse_args()
    router = Router(args.replicas, args.policy)
    web.run_app(router.app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
