"""Prometheus metrics + request latency collection
(reference: scratchpad/server/metrics.py:31-125).

Two pieces:

- ``LatencyStats`` — a tiny process-local sample sink the Engine feeds from
  its single event funnel (``Engine._postprocess_event``): TTFT on the first
  token, ITL per subsequent token (window-amortised: the host sees a fused
  decode window's K tokens at once, so the window gap is recorded as K
  equal inter-token samples), and TPOT/E2E when a request finishes. It has
  no prometheus dependency so offline Engine use costs one deque append.
- ``ServerMetrics`` — the /metrics handler. Gauges poll scheduler state at
  scrape time; counters advance by the delta of the scheduler's cumulative
  tallies; histograms drain LatencyStats (single-process registry — the
  reference needs a multiprocess collector because of its process mesh).
"""

from __future__ import annotations

import collections
import time

from aiohttp import web
from prometheus_client import (
    CollectorRegistry,
    Counter,
    Gauge,
    Histogram,
    generate_latest,
    CONTENT_TYPE_LATEST,
)

# seconds; roughly the reference's bucket ladders (server/metrics.py:38-125)
_TTFT_BUCKETS = (
    0.001, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0,
    20.0, 40.0, 80.0,
)
_ITL_BUCKETS = (
    0.0005, 0.001, 0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5,
)
_E2E_BUCKETS = (
    0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, 20.0, 40.0, 80.0, 160.0,
)


class LatencyStats:
    """Bounded sample queues; drained by the /metrics scrape handler."""

    MAX = 1 << 16

    def __init__(self):
        self.ttft = collections.deque(maxlen=self.MAX)
        self.itl = collections.deque(maxlen=self.MAX)  # (gap_seconds, count)
        self.tpot = collections.deque(maxlen=self.MAX)
        self.e2e = collections.deque(maxlen=self.MAX)
        self.queue_time = collections.deque(maxlen=self.MAX)
        self.finished_by_reason = collections.Counter()

    # -- engine-side hooks ---------------------------------------------------

    def on_tokens(self, req, n_new: int, now: float | None = None) -> None:
        """Record token arrival for ``req`` (n_new tokens surfaced now)."""
        now = time.monotonic() if now is None else now
        if req.first_token_at is None:
            req.first_token_at = now
            self.ttft.append(now - req.created_at)
        else:
            gap = now - (req.last_token_at or req.first_token_at)
            if n_new > 0:
                # the host observes a fused window's tokens at once: spread
                # the window gap over its tokens as equal ITL samples
                self.itl.append((gap / n_new, n_new))
        req.last_token_at = now

    def on_finish(self, req) -> None:
        if req.stats_done:
            return
        req.stats_done = True
        end = req.finished_at or time.monotonic()
        self.e2e.append(end - req.created_at)
        if req.first_token_at is not None:
            self.queue_time.append(req.first_token_at - req.created_at)
            n = len(req.output_ids)
            if n > 1:
                self.tpot.append(
                    ((req.last_token_at or end) - req.first_token_at)
                    / (n - 1)
                )
        reason = req.finished_reason
        self.finished_by_reason[reason.to_openai() if reason else "abort"] += 1


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
        self.gen_throughput = Gauge(
            f"{p}:gen_throughput",
            "decode tokens/s since last scrape",
            registry=self.registry,
        )
        self.gen_tokens = Counter(
            f"{p}:generation_tokens",
            "generated tokens",
            registry=self.registry,
        )
        self.prefill_tokens = Counter(
            f"{p}:prompt_tokens",
            "prefill tokens computed",
            registry=self.registry,
        )
        self.retractions = Counter(
            f"{p}:num_retractions", "retractions", registry=self.registry
        )
        self.finished = Counter(
            f"{p}:num_finished_reqs",
            "finished requests",
            ["reason"],
            registry=self.registry,
        )
        self.h_ttft = Histogram(
            f"{p}:time_to_first_token_seconds",
            "TTFT",
            buckets=_TTFT_BUCKETS,
            registry=self.registry,
        )
        self.h_itl = Histogram(
            f"{p}:inter_token_latency_seconds",
            "inter-token latency (fused windows amortised per token)",
            buckets=_ITL_BUCKETS,
            registry=self.registry,
        )
        self.h_tpot = Histogram(
            f"{p}:time_per_output_token_seconds",
            "per-request mean time per output token after the first",
            buckets=_ITL_BUCKETS,
            registry=self.registry,
        )
        self.h_e2e = Histogram(
            f"{p}:e2e_request_latency_seconds",
            "end-to-end request latency",
            buckets=_E2E_BUCKETS,
            registry=self.registry,
        )
        self._last = {"gen": 0, "prefill": 0, "retract": 0, "t": time.monotonic()}
        self._reasons_seen = collections.Counter()

        def collect():
            self.num_running.set(sched.num_running())
            self.num_waiting.set(sched.num_queued())
            total = sched.allocator.num_pages
            self.kv_usage.set(1.0 - sched.allocator.available_pages / max(total, 1))
            self.radix_pages.set(
                sched.tree_cache.evictable_pages + sched.tree_cache.protected_pages
            )
            now = time.monotonic()
            d_gen = sched.num_generated_tokens - self._last["gen"]
            self.gen_tokens.inc(d_gen)
            self.gen_throughput.set(d_gen / max(now - self._last["t"], 1e-9))
            self.prefill_tokens.inc(
                sched.num_prefill_tokens - self._last["prefill"]
            )
            self.retractions.inc(sched.num_retractions - self._last["retract"])
            self._last = {
                "gen": sched.num_generated_tokens,
                "prefill": sched.num_prefill_tokens,
                "retract": sched.num_retractions,
                "t": now,
            }
            stats: LatencyStats = engine.latency
            while stats.ttft:
                self.h_ttft.observe(stats.ttft.popleft())
            while stats.itl:
                gap, n = stats.itl.popleft()
                for _ in range(min(n, 1024)):
                    self.h_itl.observe(gap)
            while stats.tpot:
                self.h_tpot.observe(stats.tpot.popleft())
            while stats.e2e:
                self.h_e2e.observe(stats.e2e.popleft())
            for reason, n in stats.finished_by_reason.items():
                d = n - self._reasons_seen[reason]
                if d:
                    self.finished.labels(reason=reason).inc(d)
                    self._reasons_seen[reason] = n

        self._collect = collect

    async def handle(self, request) -> web.Response:
        self._collect()
        return web.Response(
            body=generate_latest(self.registry),
            content_type=CONTENT_TYPE_LATEST.split(";")[0],
        )
