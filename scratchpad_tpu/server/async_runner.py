"""Async pump around the synchronous Engine/Scheduler.

Replaces the reference's TokenizerManager <-ZMQ-> Scheduler <-ZMQ->
DetokenizerManager process mesh (reference: scratchpad/managers/tokenizer.py,
scheduler.py, detokenizer.py) with one background thread driving the
scheduler step loop; asyncio consumers receive per-request deltas through
thread-safe handoff. Single-controller JAX owns the devices, so there is
nothing to gain from extra OS processes.
"""

from __future__ import annotations

import asyncio
import queue
import threading
import time
from typing import Optional

from scratchpad_tpu.core.req import Req
from scratchpad_tpu.server.engine import Engine, GenerationOutput
from scratchpad_tpu.tokenizer.detokenizer import IncrementalDetokenizer
from scratchpad_tpu.utils import get_logger

logger = get_logger("async_runner")


class _ReqState:
    def __init__(self, loop: asyncio.AbstractEventLoop):
        self.loop = loop
        self.q: asyncio.Queue = asyncio.Queue()
        self.last_progress = time.monotonic()

    def push(self, item) -> None:
        self.loop.call_soon_threadsafe(self.q.put_nowait, item)


class AsyncEngineRunner:
    """Owns the scheduler thread; exposes async generate streams."""

    def __init__(self, engine: Engine):
        self.engine = engine
        self.submit_q: "queue.Queue[tuple[Req, _ReqState]]" = queue.Queue()
        self.states: dict[str, _ReqState] = {}
        self._stop = threading.Event()
        self._wake = threading.Event()
        self.last_step_at = time.monotonic()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()
        # watchdog: if requests are in flight but the step loop has made no
        # progress within the timeout, fail them instead of hanging clients
        # (reference: scheduler.py:370-385 watchdog_thread)
        self._watchdog = threading.Thread(target=self._watch, daemon=True)
        self._watchdog.start()

    def _watch(self) -> None:
        timeout = self.engine.args.watchdog_timeout
        while not self._stop.wait(timeout / 4):
            if not self.states:
                self.last_step_at = time.monotonic()
                continue
            if time.monotonic() - self.last_step_at > timeout:
                logger.critical(
                    "watchdog: no scheduler progress in %.0fs with %d "
                    "requests in flight; failing them",
                    timeout,
                    len(self.states),
                )
                for rid in list(self.states):
                    self.engine.scheduler.abort_request(rid)
                self._fail_all()
                self.last_step_at = time.monotonic()

    # ------------------------------------------------------------- scheduler

    def _loop(self) -> None:
        sched = self.engine.scheduler
        while not self._stop.is_set():
            self._drain_submits()
            if not sched.has_work():
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            try:
                events = sched.step()
            except Exception:
                logger.exception("scheduler step failed")
                self._fail_all()
                continue
            self.last_step_at = time.monotonic()
            for ev in events:
                self.engine._postprocess_event(ev)
                st = self.states.get(ev.req.rid)
                if st is None:
                    continue
                req = ev.req
                safe = IncrementalDetokenizer.stream_safe_len(req)
                ntok = len(req.output_ids)
                if safe > req.stream_sent_len:
                    st.push(
                        ("delta", req.decoded_text[req.stream_sent_len : safe])
                    )
                    req.stream_sent_len = safe
                elif ntok > req.stream_sent_tokens and not req.finished():
                    # token progress with no streamable text (tokenizer-less
                    # lab serving, held-back partial UTF-8/stop matches):
                    # emit an empty delta so clients see per-window progress
                    # (TTFT/ITL stay measurable; OpenAI clients ignore "")
                    st.push(("delta", ""))
                req.stream_sent_tokens = ntok
                if req.finished():
                    if req.is_embedding:
                        st.push(("done", req.embedding))
                        del self.states[req.rid]
                        continue
                    if req.is_score:
                        st.push(("done", req.prompt_logprobs))
                        del self.states[req.rid]
                        continue
                    out = self.engine._to_output(req)
                    if len(req.decoded_text) > req.stream_sent_len:
                        st.push(
                            ("delta", req.decoded_text[req.stream_sent_len :])
                        )
                        req.stream_sent_len = len(req.decoded_text)
                    st.push(("done", out))
                    del self.states[req.rid]

    def _drain_submits(self) -> None:
        while True:
            try:
                req, st = self.submit_q.get_nowait()
            except queue.Empty:
                return
            self.states[req.rid] = st
            self.engine.scheduler.add_request(req)

    def _fail_all(self) -> None:
        for rid, st in list(self.states.items()):
            st.push(("error", "internal scheduler error"))
            del self.states[rid]

    # ---------------------------------------------------------------- public

    async def generate(
        self,
        prompt: Optional[str] = None,
        input_ids: Optional[list[int]] = None,
        sampling_params=None,
        rid: Optional[str] = None,
        return_logprob: bool = False,
        image_data=None,
        video_data=None,
        stream: bool = False,
    ):
        """Async generator yielding ("delta", str) then ("done", output)."""
        req = self.engine._make_req(
            prompt,
            input_ids,
            sampling_params,
            return_logprob,
            rid=rid,
            image_data=image_data,
            video_data=video_data,
        )
        req.stream = stream
        st = _ReqState(asyncio.get_running_loop())
        self.submit_q.put((req, st))
        self._wake.set()
        try:
            while True:
                kind, payload = await st.q.get()
                yield kind, payload
                if kind in ("done", "error"):
                    return
        finally:
            if not req.finished():
                self.engine.scheduler.abort_request(req.rid)
                self.states.pop(req.rid, None)

    async def score(self, input_ids: list[int]):
        """Teacher-forcing prompt logprobs through the scheduler thread
        (the echo+logprobs / lm-eval loglikelihood primitive)."""
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        req = self.engine._make_req(
            None, input_ids, SamplingParams(max_new_tokens=0)
        )
        req.is_score = True
        st = _ReqState(asyncio.get_running_loop())
        self.submit_q.put((req, st))
        self._wake.set()
        while True:
            kind, payload = await st.q.get()
            if kind == "error":
                raise RuntimeError(payload)
            if kind == "done":
                return payload

    async def encode(
        self,
        prompt: Optional[str] = None,
        input_ids: Optional[list[int]] = None,
    ):
        """Embedding through the scheduler thread (no cross-thread stepping)."""
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        req = self.engine._make_req(
            prompt, input_ids, SamplingParams(max_new_tokens=0)
        )
        req.is_embedding = True
        st = _ReqState(asyncio.get_running_loop())
        self.submit_q.put((req, st))
        self._wake.set()
        while True:
            kind, payload = await st.q.get()
            if kind == "error":
                raise RuntimeError(payload)
            if kind == "done":
                return payload

    async def generate_full(self, **kw) -> GenerationOutput:
        async for kind, payload in self.generate(**kw):
            if kind == "error":
                raise RuntimeError(payload)
            if kind == "done":
                return payload
        raise RuntimeError("generation ended without result")

    def shutdown(self) -> None:
        self._stop.set()
        self._wake.set()
        self.thread.join(timeout=5)
