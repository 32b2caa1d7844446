"""Ring attention: causal self-attention sharded on the SEQUENCE axis.

Beyond-reference capability (the reference has no sequence/context
parallelism anywhere — SURVEY.md §2.7/§5): long-prompt prefill splits the
token axis across the mesh's ``sp`` devices; each device keeps its Q chunk
resident while K/V blocks rotate around the ring (one ``lax.ppermute`` per
step), accumulating flash-style online softmax. Peak activation memory per
device is O(T/N) and the N-1 rotations ride the ICI ring — the standard
TPU recipe (Ring Attention / blockwise-parallel transformers).

The op is the building block; ``sp_ring_attention`` wraps it in shard_map
for a given mesh. Serving integration (paged-KV writes from sharded rows)
targets fresh long-prompt prefills.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30


def _ring_body(q, k, v, axis_name: str, n_shards: int, sm_scale: float):
    """shard_map body: q [Ts, Hq, D], k/v [Ts, Hkv, D] local chunks."""
    Ts, Hq, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    idx = jax.lax.axis_index(axis_name)

    qf = q.astype(jnp.float32) * sm_scale
    m = jnp.full((Ts, Hq), _NEG, jnp.float32)
    l = jnp.zeros((Ts, Hq), jnp.float32)
    acc = jnp.zeros((Ts, Hq, D), jnp.float32)
    rows = idx * Ts + jnp.arange(Ts)  # global q rows

    kb, vb = k, v
    for r in range(n_shards):
        blk = (idx - r) % n_shards  # global block id currently held
        kf = jnp.repeat(kb.astype(jnp.float32), G, axis=1)  # [Ts, Hq, D]
        vf = jnp.repeat(vb.astype(jnp.float32), G, axis=1)
        s = jnp.einsum("qhd,khd->qhk", qf, kf)  # [Ts, Hq, Ts]
        cols = blk * Ts + jnp.arange(Ts)
        causal = cols[None, :] <= rows[:, None]  # [Ts, Ts]
        s = jnp.where(causal[:, None, :], s, _NEG)
        m_new = jnp.maximum(m, s.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[:, :, None])
        p = jnp.where(causal[:, None, :], p, 0.0)
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[:, :, None] + jnp.einsum("qhk,khd->qhd", p, vf)
        m = m_new
        if r + 1 < n_shards:
            perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
    out = acc / jnp.maximum(l, 1e-30)[:, :, None]
    return out.astype(q.dtype)


def sp_ring_attention(
    mesh: Mesh,
    q: jax.Array,  # [T, Hq, D] sequence-sharded (or to be sharded)
    k: jax.Array,  # [T, Hkv, D]
    v: jax.Array,  # [T, Hkv, D]
    sm_scale: float,
    axis_name: str = "sp",
) -> jax.Array:
    """Causal self-attention over the full sequence with T sharded on
    ``axis_name``. T must divide evenly by the axis size."""
    n = mesh.shape[axis_name]
    assert q.shape[0] % n == 0, (q.shape, n)
    body = functools.partial(
        _ring_body, axis_name=axis_name, n_shards=n, sm_scale=sm_scale
    )
    spec = P(axis_name, None, None)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )(q, k, v)
