"""Test helpers: drive a ModelRunner manually (mini engine loop)."""

from __future__ import annotations

import numpy as np

from scratchpad_tpu.executor.forward_meta import ForwardMode
from scratchpad_tpu.executor.model_runner import ModelRunner, WorkerBatch
from scratchpad_tpu.sampling.batch_info import SamplingBatchInfo


def greedy_sinfo(n, vocab):
    return SamplingBatchInfo(
        temperature=np.zeros(n, np.float32),
        top_p=np.ones(n, np.float32),
        top_k=np.full(n, vocab, np.int32),
        min_p=np.zeros(n, np.float32),
    )


class SimpleSession:
    """Single-request helper that allocates pages and drives extend/decode."""

    def __init__(self, runner: ModelRunner):
        self.runner = runner
        self.ps = runner.page_size
        self.pages = np.empty(0, np.int32)
        self.len = 0

    def _ensure_pages(self, new_len):
        need = -(-new_len // self.ps) - len(self.pages)
        if need > 0:
            got = self.runner.page_allocator.alloc(need)
            assert got is not None, "out of KV pages"
            self.pages = np.concatenate([self.pages, got])

    def _slots(self, start, end):
        pos = np.arange(start, end)
        return (self.pages[pos // self.ps] * self.ps + pos % self.ps).astype(np.int32)

    def extend(self, token_ids: list[int]):
        """Run one extend chunk; returns sampled next token id."""
        n = len(token_ids)
        start = self.len
        self._ensure_pages(start + n)
        wb = WorkerBatch(
            mode=ForwardMode.EXTEND,
            tokens=np.asarray(token_ids, np.int32),
            positions=np.arange(start, start + n, dtype=np.int32),
            out_cache_loc=self._slots(start, start + n),
            req_indices=np.zeros(n, np.int32),
            page_table=self.pages[None, :].astype(np.int32),
            seq_lens=np.array([start + n], np.int32),
            extend_lens=np.array([n], np.int32),
            sampling_info=greedy_sinfo(1, self.runner.model_config.vocab_size),
        )
        self.len = start + n
        out = self.runner.forward_and_sample(wb)
        return int(np.asarray(out.next_token_ids)[0])

    def decode(self, token_id: int):
        pos = self.len
        self._ensure_pages(pos + 1)
        wb = WorkerBatch(
            mode=ForwardMode.DECODE,
            tokens=np.array([token_id], np.int32),
            positions=np.array([pos], np.int32),
            out_cache_loc=self._slots(pos, pos + 1),
            req_indices=np.zeros(1, np.int32),
            page_table=self.pages[None, :].astype(np.int32),
            seq_lens=np.array([pos + 1], np.int32),
            extend_lens=np.ones(1, np.int32),
            sampling_info=greedy_sinfo(1, self.runner.model_config.vocab_size),
        )
        self.len = pos + 1
        out = self.runner.forward_and_sample(wb)
        return int(np.asarray(out.next_token_ids)[0])


def greedy_generate(runner: ModelRunner, prompt_ids: list[int], max_new: int,
                    chunk: int | None = None) -> list[int]:
    s = SimpleSession(runner)
    if chunk:
        tok = None
        for i in range(0, len(prompt_ids), chunk):
            tok = s.extend(prompt_ids[i : i + chunk])
    else:
        tok = s.extend(list(prompt_ids))
    out = [tok]
    for _ in range(max_new - 1):
        tok = s.decode(tok)
        out.append(tok)
    return out
