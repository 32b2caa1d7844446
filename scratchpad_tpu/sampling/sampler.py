"""Device-side sampler: penalties + top-k/top-p/min-p + categorical draw.

Replaces the reference Sampler + flashinfer fused sampling kernels
(reference: scratchpad/nn/layers/sampler.py:23-160,
scratchpad/nn/kernels/sampling.py). Pure jnp; runs inside the jitted
forward+sample step so XLA fuses it with the logits epilogue. A Pallas
fused top-k/p kernel can later replace the sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scratchpad_tpu.sampling.batch_info import SamplingBatchInfo

_NEG = -1e30


def apply_penalties(logits: jax.Array, info: SamplingBatchInfo) -> jax.Array:
    """Presence/frequency/repetition penalties
    (reference: scratchpad/sampling/penaltylib/)."""
    if info.output_token_counts is None:
        return logits
    counts = info.output_token_counts.astype(jnp.float32)  # [B, V]
    logits = logits - info.frequency_penalty[:, None] * counts
    logits = logits - info.presence_penalty[:, None] * (counts > 0)
    # repetition penalty applies to prompt + generated tokens
    seen = (counts > 0) | info.input_token_mask
    rep = info.repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(seen, penalized, logits)
    return logits


def apply_vocab_bitmask(logits: jax.Array, bitmask: jax.Array) -> jax.Array:
    """Mask logits with a packed uint32 allow-bitmask (grammar decoding).

    Analogue of xgrammar's apply_token_bitmask triton op
    (reference: scratchpad/constrained/triton_ops/bitmask_ops.py)."""
    B, V = logits.shape
    word = jnp.arange(V, dtype=jnp.uint32) // 32
    bit = jnp.arange(V, dtype=jnp.uint32) % 32
    allowed = (bitmask[:, word] >> bit) & 1  # [B, V]
    return jnp.where(allowed.astype(bool), logits, _NEG)


def sample(
    logits: jax.Array,  # f32[B, V]
    info: SamplingBatchInfo,
    rng: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Returns (token_ids i32[B], logprobs f32[B, V] post-penalty pre-filter).

    Filtering order matches the reference: penalties -> temperature ->
    top-k -> top-p -> min-p -> categorical
    (reference: scratchpad/nn/layers/sampler.py:63-125).
    """
    B, V = logits.shape
    logits = apply_penalties(logits, info)
    if info.vocab_bitmask is not None:
        logits = apply_vocab_bitmask(logits, info.vocab_bitmask)
    logprobs = jax.nn.log_softmax(logits, axis=-1)

    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # the sort-based filter and the RNG draw are expensive at 128k vocab;
    # run them only when some row actually needs them (lax.cond executes a
    # single branch at runtime — the greedy hot path stays sort-free)
    any_sampling = jnp.any(info.temperature > 0.0)
    need_filter = jnp.any(
        (info.top_k < V) | (info.top_p < 1.0) | (info.min_p > 0.0)
    )

    def _filter(scaled):
        probs = jax.nn.softmax(scaled, axis=-1)
        sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]  # desc
        # top-k: threshold at the k-th largest probability
        k_idx = jnp.clip(info.top_k - 1, 0, V - 1)
        kth = jnp.take_along_axis(sorted_probs, k_idx[:, None], axis=-1)
        keep = probs >= kth
        # top-p: smallest set with cumulative prob >= top_p
        cumsum = jnp.cumsum(sorted_probs, axis=-1)
        cum_before = cumsum - sorted_probs
        sorted_cut = cum_before < info.top_p[:, None]
        num_kept_sorted = jnp.sum(sorted_cut, axis=-1)
        pth = jnp.take_along_axis(
            sorted_probs,
            jnp.clip(num_kept_sorted - 1, 0, V - 1)[:, None],
            axis=-1,
        )
        keep &= probs >= pth
        # min-p: keep probs >= max_prob * min_p
        keep &= probs >= sorted_probs[:, :1] * info.min_p[:, None]
        return jnp.where(keep, scaled, _NEG)

    def _sampled_branch(_):
        temp = jnp.maximum(info.temperature, 1e-6)[:, None]
        scaled = logits / temp
        filtered = jax.lax.cond(need_filter, _filter, lambda s: s, scaled)
        return jax.random.categorical(rng, filtered, axis=-1).astype(jnp.int32)

    sampled = jax.lax.cond(
        any_sampling, _sampled_branch, lambda _: greedy_ids, None
    )
    ids = jnp.where(info.temperature > 0, sampled, greedy_ids)
    return ids, logprobs
