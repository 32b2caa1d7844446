"""Ring attention: causal self-attention sharded on the SEQUENCE axis.

Beyond-reference capability (the reference has no sequence/context
parallelism anywhere — SURVEY.md §2.7/§5): long-prompt prefill splits the
token axis across the mesh's ``sp`` devices; each device keeps its Q chunk
resident while K/V blocks rotate around the ring (one ``lax.ppermute`` per
step), accumulating flash-style online softmax. Peak activation memory per
device is O(T/N) and the N-1 rotations ride the ICI ring — the standard
TPU recipe (Ring Attention / blockwise-parallel transformers).

Round-2 widening (VERDICT item 7): the mask is driven by per-row/col
(request id, position) metadata that rotates with the K/V blocks, so one
SP batch may hold SEVERAL requests (block-diagonal); an optional
replicated prefix block attends cached-prefix K/V before the ring starts
(radix prefix hits); Gemma-style logit softcap and sliding windows apply
inside the online softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30


def _ring_body(
    q,  # [Ts, Hq, D] local q chunk
    k,  # [Ts, Hkv, D] local kv chunk (token order)
    v,
    row_pos,  # i32[Ts] per-request position of each local q row
    row_req,  # i32[Ts] request id of each local q row
    kp,  # [Cp, Hkv, D] replicated cached-prefix K (Cp may be 0)
    vp,
    plen,  # i32[1] valid prefix length (<= Cp); prefix rows beyond = pad
    axis_name: str,
    n_shards: int,
    sm_scale: float,
    logit_cap,
    window,
):
    Ts, Hq, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    idx = jax.lax.axis_index(axis_name)

    qf = q.astype(jnp.float32) * sm_scale
    m = jnp.full((Ts, Hq), _NEG, jnp.float32)
    l = jnp.zeros((Ts, Hq), jnp.float32)
    acc = jnp.zeros((Ts, Hq, D), jnp.float32)

    def absorb(m, l, acc, kf, vf, mask):
        """One online-softmax block update. kf/vf [C, Hq, D], mask [Ts, C]."""
        s = jnp.einsum("qhd,khd->qhk", qf, kf)  # [Ts, Hq, C]
        if logit_cap:
            s = logit_cap * jnp.tanh(s / logit_cap)
        s = jnp.where(mask[:, None, :], s, _NEG)
        m_new = jnp.maximum(m, s.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[:, :, None])
        p = jnp.where(mask[:, None, :], p, 0.0)
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[:, :, None] + jnp.einsum("qhk,khd->qhd", p, vf)
        return m_new, l, acc

    def win_ok(rpos, cpos):
        ok = cpos[None, :] <= rpos[:, None]
        if window is not None:
            ok &= (rpos[:, None] - cpos[None, :]) < window
        return ok

    # cached prefix block (single-request scope: prefix cols belong to the
    # same request as every row; padding masked by plen)
    Cp = kp.shape[0]
    if Cp > 0:
        ppos = jnp.arange(Cp, dtype=jnp.int32)
        mask = (ppos[None, :] < plen[0]) & win_ok(row_pos, ppos)
        kf = jnp.repeat(kp.astype(jnp.float32), G, axis=1)
        vf = jnp.repeat(vp.astype(jnp.float32), G, axis=1)
        m, l, acc = absorb(m, l, acc, kf, vf, mask)

    kb, vb, cpos, creq = k, v, row_pos, row_req
    for r in range(n_shards):
        kf = jnp.repeat(kb.astype(jnp.float32), G, axis=1)  # [Ts, Hq, D]
        vf = jnp.repeat(vb.astype(jnp.float32), G, axis=1)
        mask = (creq[None, :] == row_req[:, None]) & win_ok(row_pos, cpos)
        m, l, acc = absorb(m, l, acc, kf, vf, mask)
        if r + 1 < n_shards:
            perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
            cpos = jax.lax.ppermute(cpos, axis_name, perm)
            creq = jax.lax.ppermute(creq, axis_name, perm)
    out = acc / jnp.maximum(l, 1e-30)[:, :, None]
    return out.astype(q.dtype)


def sp_ring_attention(
    mesh: Mesh,
    q: jax.Array,  # [T, Hq, D] sequence-sharded (or to be sharded)
    k: jax.Array,  # [T, Hkv, D]
    v: jax.Array,  # [T, Hkv, D]
    sm_scale: float,
    axis_name: str = "sp",
    positions: jax.Array = None,  # i32[T] per-request positions
    req_ids: jax.Array = None,  # i32[T] request id per token
    prefix_k: jax.Array = None,  # [Cp, Hkv, D] replicated cached prefix
    prefix_v: jax.Array = None,
    prefix_len: jax.Array = None,  # i32[] valid rows of the prefix block
    logit_cap: float = None,
    sliding_window: int = None,
) -> jax.Array:
    """Causal (block-diagonal over requests) attention with T sharded on
    ``axis_name``. T must divide evenly by the axis size."""
    n = mesh.shape[axis_name]
    T = q.shape[0]
    assert T % n == 0, (q.shape, n)
    if positions is None:
        positions = jnp.arange(T, dtype=jnp.int32)
    if req_ids is None:
        req_ids = jnp.zeros(T, jnp.int32)
    Hkv, D = k.shape[1], k.shape[2]
    if prefix_k is None:
        prefix_k = jnp.zeros((0, Hkv, D), k.dtype)
        prefix_v = jnp.zeros((0, Hkv, D), v.dtype)
    if prefix_len is None:
        prefix_len = jnp.zeros(1, jnp.int32)
    else:
        prefix_len = jnp.reshape(prefix_len, (1,)).astype(jnp.int32)
    body = functools.partial(
        _ring_body,
        axis_name=axis_name,
        n_shards=n,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
        window=sliding_window,
    )
    spec = P(axis_name, None, None)
    vec = P(axis_name)
    rep = P()
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, vec, vec, rep, rep, rep),
        out_specs=spec,
    )(q, k, v, positions, req_ids, prefix_k, prefix_v, prefix_len)
