"""Pipeline parallelism (PP) over a mesh ``pp`` axis.

Beyond-reference execution: the reference only *builds* PP process groups
and never runs a pipelined forward (reference:
scratchpad/distributed/parallel_state.py:984-999 creates groups,
distributed/utils.py:48 get_pp_indices; no execution path). Here PP is a
real execution mode for the stacked-decoder (Llama-family) models:

- the stacked layer axis of the params is sharded over ``pp`` (stage s
  holds layers [s*L/S, (s+1)*L/S)), and the layer-major paged KV cache
  shards on its global page axis, which is exactly per-stage layer pages;
- one forward runs GPipe-style inside a single shard_map: activations
  flow stage -> stage+1 via ``ppermute``; with M microbatches (decode
  row-splits) the stages overlap on different microbatches, filling the
  pipeline in M + S - 1 ticks;
- the last stage's hidden states are summed back to every device (psum of
  a one-hot-stage contribution) and the LM head runs replicated, so the
  step's public signature is unchanged.

Scope (v1): pp-only meshes (no tp/dp axes mixed in), unquantized weights,
no adapters/multimodal in the batch. Microbatching > 1 applies to decode
batches (row splits); extend runs as one microbatch marching through the
stages.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from scratchpad_tpu.executor.forward_meta import ForwardMeta
from scratchpad_tpu.memory.kv_cache import KVCache


def pp_param_specs(params: dict, axis: str = "pp", base_specs=None) -> dict:
    """Placement specs for a PP mesh: stacked decoder layers shard their
    leading (layer) axis over ``axis``. With ``base_specs`` (the model's
    TP PartitionSpec tree) the per-weight tp axes are kept, composing
    pp x tp: a layer weight P(None, "tp") becomes P("pp", "tp")."""

    def layer_spec(x):
        return P(axis, *([None] * (x.ndim - 1)))

    def repl(x):
        return P(*([None] * x.ndim))

    if base_specs is None:
        return {
            k: jax.tree.map(layer_spec if k == "layers" else repl, v)
            for k, v in params.items()
        }

    def compose(spec):
        return P(axis, *tuple(spec)[1:])

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = jax.tree.map(
                compose,
                base_specs[k],
                is_leaf=lambda s: isinstance(s, P),
            )
        else:
            out[k] = base_specs.get(k) or jax.tree.map(repl, v)
    return out


def _slice_meta(meta: ForwardMeta, start, bm: int) -> ForwardMeta:
    """Row-slice a DECODE batch (T == B, req_indices == arange)."""
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, bm, 0)
    return dataclasses.replace(
        meta,
        tokens=sl(meta.tokens),
        positions=sl(meta.positions),
        out_cache_loc=sl(meta.out_cache_loc),
        req_indices=jnp.arange(bm, dtype=jnp.int32),
        page_table=sl(meta.page_table),
        seq_lens=sl(meta.seq_lens),
        extend_lens=sl(meta.extend_lens),
        last_token_idx=jnp.arange(bm, dtype=jnp.int32),
    )


def pp_call(
    model,
    params: dict,
    kv: KVCache,
    meta: ForwardMeta,
    mesh: Mesh,
    microbatches: int = 1,
):
    """Drop-in replacement for ``model(params, kv, meta)`` on a PP mesh."""
    S = mesh.shape["pp"]
    L = model.cfg.num_hidden_layers
    assert L % S == 0, f"num_hidden_layers {L} must divide over pp={S}"
    assert "layers_q" not in params, "PP with quantized weights: not yet"
    assert meta.active_adapters is None, "PP with adapters: not yet"
    assert meta.input_embeds is None and meta.cross_slots is None, (
        "PP with multimodal batches: not yet"
    )
    T = meta.num_tokens
    M = microbatches if (meta.mode.is_decode() and T % microbatches == 0) else 1
    bm = T // M
    Lloc = L // S

    x0 = model.embed_tokens(params, meta)  # replicated [T, H]
    layer_stack = params["layers"]

    def body(layer_stack, kvc, x0, meta):
        s = jax.lax.axis_index("pp")
        kvc = dataclasses.replace(kvc, num_layers=Lloc)
        local_ids = jnp.arange(Lloc, dtype=jnp.int32)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(t, carry):
            xbuf, kvc, h_out = carry
            mb = t - s
            active = (mb >= 0) & (mb < M)
            start = jnp.clip(mb, 0, M - 1) * bm
            x_in = jax.lax.cond(
                s == 0,
                lambda: jax.lax.dynamic_slice_in_dim(x0, start, bm, 0),
                lambda: xbuf,
            )
            meta_mb = _slice_meta(meta, start, bm) if M > 1 else meta

            def run(op):
                x, kvx = op
                return model.layers_forward(
                    {}, layer_stack, local_ids, x, kvx, meta_mb
                )

            y, kvc = jax.lax.cond(active, run, lambda op: op, (x_in, kvc))
            h_out = jax.lax.cond(
                active & (s == S - 1),
                lambda ho: jax.lax.dynamic_update_slice_in_dim(
                    ho, y, start, 0
                ),
                lambda ho: ho,
                h_out,
            )
            xnext = jax.lax.ppermute(y, "pp", perm)
            return xnext, kvc, h_out

        carry0 = (
            jnp.zeros((bm, x0.shape[1]), x0.dtype),
            kvc,
            jnp.zeros_like(x0),
        )
        _, kvc, h_out = jax.lax.fori_loop(0, M + S - 1, tick, carry0)
        # only the last stage holds real outputs; sum replicates them
        # (psum in f32: the bf16 psum trips an XLA:CPU partial-auto
        # partitioner check failure, "invalid binary instruction opcode
        # copy", on pp x tp meshes)
        h = jax.lax.psum(
            jnp.where(s == S - 1, h_out, jnp.zeros((), h_out.dtype)).astype(
                jnp.float32
            ),
            "pp",
        ).astype(h_out.dtype)
        kvc = dataclasses.replace(kvc, num_layers=L)
        return h, kvc

    shard = lambda x: P("pp", *([None] * (x.ndim - 1)))
    repl = lambda x: P(*([None] * x.ndim))
    # manual over "pp" only: any other mesh axis (tp) stays GSPMD-auto, so
    # the per-stage layer math keeps its tensor-parallel partitioning and
    # XLA inserts the tp collectives inside each pipeline tick
    manual = frozenset({"pp"})
    h, kv_out = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            jax.tree.map(shard, layer_stack),
            jax.tree.map(shard, kv),
            P(None, None),
            jax.tree.map(repl, meta),
        ),
        out_specs=(P(None, None), jax.tree.map(shard, kv)),
        axis_names=manual,
        check_vma=False,
    )(layer_stack, kv, x0, meta)
    return kv_out, model.finish(params, h, meta)
