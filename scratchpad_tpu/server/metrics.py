"""Prometheus metrics (reference: scratchpad/server/metrics.py:31-120).

Gauges poll scheduler state at scrape time; counters/histograms are updated
by the scrape handler from scheduler counters (single-process registry — the
reference needs a multiprocess collector because of its process mesh).
"""

from __future__ import annotations

from aiohttp import web
from prometheus_client import (
    CollectorRegistry,
    Gauge,
    generate_latest,
    CONTENT_TYPE_LATEST,
)


class ServerMetrics:
    def __init__(self, engine):
        self.engine = engine
        self.registry = CollectorRegistry()
        sched = engine.scheduler
        p = "scratchpad_tpu"
        self.num_running = Gauge(
            f"{p}:num_running_reqs", "running requests", registry=self.registry
        )
        self.num_waiting = Gauge(
            f"{p}:num_waiting_reqs", "queued requests", registry=self.registry
        )
        self.kv_usage = Gauge(
            f"{p}:token_usage", "KV pool usage fraction", registry=self.registry
        )
        self.radix_pages = Gauge(
            f"{p}:radix_cache_pages", "radix tree pages", registry=self.registry
        )
        self.gen_tokens = Gauge(
            f"{p}:generation_tokens_total",
            "generated tokens",
            registry=self.registry,
        )
        self.prefill_tokens = Gauge(
            f"{p}:prompt_tokens_total",
            "prefill tokens computed",
            registry=self.registry,
        )
        self.retractions = Gauge(
            f"{p}:num_retractions_total", "retractions", registry=self.registry
        )

        def collect():
            self.num_running.set(sched.num_running())
            self.num_waiting.set(sched.num_queued())
            total = sched.allocator.num_pages
            self.kv_usage.set(1.0 - sched.allocator.available_pages / max(total, 1))
            self.radix_pages.set(
                sched.tree_cache.evictable_pages + sched.tree_cache.protected_pages
            )
            self.gen_tokens.set(sched.num_generated_tokens)
            self.prefill_tokens.set(sched.num_prefill_tokens)
            self.retractions.set(sched.num_retractions)

        self._collect = collect

    async def handle(self, request) -> web.Response:
        self._collect()
        return web.Response(
            body=generate_latest(self.registry),
            content_type=CONTENT_TYPE_LATEST.split(";")[0],
        )
