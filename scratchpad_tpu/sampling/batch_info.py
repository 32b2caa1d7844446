"""Batched sampling state shipped to the device each step.

Analogue of SamplingBatchInfo (reference: scratchpad/sampling/sampling_batch_info.py:15).
Fixed [B]-shaped arrays padded to the decode bucket; padding rows are greedy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax


@dataclasses.dataclass
class SamplingBatchInfo:
    temperature: jax.Array  # f32[B] (0 = greedy)
    top_p: jax.Array  # f32[B]
    top_k: jax.Array  # i32[B] (V for disabled)
    min_p: jax.Array  # f32[B]
    # penalties (None when no request in the batch uses them)
    presence_penalty: Optional[jax.Array] = None  # f32[B]
    frequency_penalty: Optional[jax.Array] = None  # f32[B]
    repetition_penalty: Optional[jax.Array] = None  # f32[B]
    output_token_counts: Optional[jax.Array] = None  # i32[B, V]
    input_token_mask: Optional[jax.Array] = None  # bool[B, V]
    # grammar vocab bitmask (int32-packed, None when no grammar active)
    vocab_bitmask: Optional[jax.Array] = None  # u32[B, ceil(V/32)]
    # additive OpenAI logit_bias (None when no request in the batch has one)
    logit_bias: Optional[jax.Array] = None  # f32[B, V]
    # user-supplied logit transforms (sampling/custom_logit_processor.py):
    # custom_processors is a META tuple of distinct jax-traceable callables
    # (jit keys on it — a new processor compiles one new step variant);
    # custom_proc_mask[i] marks the rows processor i applies to and
    # custom_proc_params[i] is its dict of per-row f32[B] scalars
    custom_processors: Optional[tuple] = None
    custom_proc_mask: Optional[jax.Array] = None  # bool[P, B]
    custom_proc_params: Optional[tuple] = None  # tuple[dict[str, f32[B]]]

    @property
    def needs_penalties(self) -> bool:
        return self.output_token_counts is not None

    @staticmethod
    def from_reqs(reqs, bucket_size: int, vocab_size: int) -> "SamplingBatchInfo":
        """Build padded host arrays from scheduler Req objects."""
        B = bucket_size
        temperature = np.zeros(B, np.float32)
        top_p = np.ones(B, np.float32)
        top_k = np.full(B, vocab_size, np.int32)
        min_p = np.zeros(B, np.float32)
        any_pen = any(r.sampling_params.needs_penalties() for r in reqs)
        pres = np.zeros(B, np.float32) if any_pen else None
        freq = np.zeros(B, np.float32) if any_pen else None
        rep = np.ones(B, np.float32) if any_pen else None
        for i, r in enumerate(reqs):
            sp = r.sampling_params
            temperature[i] = sp.temperature
            top_p[i] = sp.top_p
            top_k[i] = sp.top_k if sp.top_k > 0 else vocab_size
            min_p[i] = sp.min_p
            if any_pen:
                pres[i] = sp.presence_penalty
                freq[i] = sp.frequency_penalty
                rep[i] = sp.repetition_penalty
        bias = None
        if any(r.sampling_params.logit_bias for r in reqs):
            bias = np.zeros((B, vocab_size), np.float32)
            for i, r in enumerate(reqs):
                for tid, b in (r.sampling_params.logit_bias or {}).items():
                    if 0 <= int(tid) < vocab_size:
                        bias[i, int(tid)] = b
        out_counts = None
        in_mask = None
        if any_pen:
            out_counts = np.zeros((B, vocab_size), np.int32)
            in_mask = np.zeros((B, vocab_size), np.bool_)
            for i, r in enumerate(reqs):
                if r.output_ids:
                    ids, counts = np.unique(
                        np.asarray(r.output_ids, np.int64), return_counts=True
                    )
                    out_counts[i, ids] = counts
                in_mask[i, np.asarray(r.origin_input_ids, np.int64)] = True
        procs = mask = pparams = None
        if any(r.sampling_params.custom_logit_processor is not None for r in reqs):
            groups: dict = {}  # processor -> row list (dict keeps order)
            for i, r in enumerate(reqs):
                proc = r.sampling_params.custom_logit_processor
                if proc is not None:
                    groups.setdefault(proc, []).append(i)
            procs = tuple(groups)
            mask = np.zeros((len(procs), B), np.bool_)
            pparams = []
            for pi, (proc, rows) in enumerate(groups.items()):
                mask[pi, rows] = True
                keys = sorted(
                    {
                        k
                        for i in rows
                        for k in (reqs[i].sampling_params.custom_params or ())
                    }
                )
                d = {k: np.zeros(B, np.float32) for k in keys}
                for i in rows:
                    for k, v in (reqs[i].sampling_params.custom_params or {}).items():
                        d[k][i] = float(v)
                pparams.append(d)
            pparams = tuple(pparams)
        return SamplingBatchInfo(
            temperature=temperature,
            top_p=top_p,
            top_k=top_k,
            min_p=min_p,
            presence_penalty=pres,
            frequency_penalty=freq,
            repetition_penalty=rep,
            output_token_counts=out_counts,
            input_token_mask=in_mask,
            logit_bias=bias,
            custom_processors=procs,
            custom_proc_mask=mask,
            custom_proc_params=pparams,
        )


jax.tree_util.register_dataclass(
    SamplingBatchInfo,
    data_fields=[
        "temperature",
        "top_p",
        "top_k",
        "min_p",
        "presence_penalty",
        "frequency_penalty",
        "repetition_penalty",
        "output_token_counts",
        "input_token_mask",
        "vocab_bitmask",
        "logit_bias",
        "custom_proc_mask",
        "custom_proc_params",
    ],
    meta_fields=["custom_processors"],
)
