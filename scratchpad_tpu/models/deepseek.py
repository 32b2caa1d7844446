"""DeepSeek-V2 family: multi-head latent attention + fine-grained MoE.

Counterpart of the reference's MLA support (MLATokenToKVPool,
reference: scratchpad/memory/pool.py:427-474, and the Triton grouped-MQA
decode path it forces, scratchpad/model_executor/model_runner.py:76-81).

TPU-first shape of the computation:
- KV cache stores only the compressed latent ``[c_kv | k_rope]`` (one
  vector per token per layer) — 576 floats/token for V2 vs 2*Hkv*D for MHA.
- Attention runs fully in the latent space by absorbing W_UK into the
  query and W_UV into the output (see ops/attention/mla_backend.py), so
  decode reads are MQA-shaped and HBM-optimal.
- Layers scan in two homogeneous groups: the first ``first_k_dense_replace``
  layers (dense MLP) and the remaining MoE layers (shared + routed
  experts as dense masked matmuls, MXU-friendly like models/mixtral.py).

Weight conventions follow HF ``modeling_deepseek_v2`` (complex/adjacent-pair
rope on the rope dims only; softmax-topk routing WITHOUT renormalisation,
scaled by routed_scaling_factor; shared experts always active).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
from scratchpad_tpu.memory.kv_cache import KVCache
from scratchpad_tpu.models.common import (
    apply_rope_interleaved,
    compute_inv_freq,
    rms_norm,
    shard_rows,
    silu_mul,
)
from scratchpad_tpu.ops.attention.mla_backend import (
    mla_attention_xla,
    write_latent,
)


def _yarn_rope_scale(rs: Optional[dict]) -> float:
    """HF's cos/sin multiplier for DeepSeek-yarn (applies to rope dims only)."""
    if not rs or rs.get("rope_type", rs.get("type")) != "yarn":
        return 1.0
    if rs.get("attention_factor") is not None:
        return float(rs["attention_factor"])
    factor = rs["factor"]

    def gm(scale, m=1.0):
        return 0.1 * m * np.log(scale) + 1.0 if scale > 1 else 1.0

    mscale, mad = rs.get("mscale"), rs.get("mscale_all_dim")
    if mscale and mad:
        return float(gm(factor, mscale) / gm(factor, mad))
    return float(gm(factor))


class DeepseekV2ForCausalLM:
    page_size: int = 16
    supports_pallas_attention = False  # MLA uses its own latent backend
    # DP attention: per-layer params that replicate when attention runs
    # data-parallel (models/common.py dp_attention_respec)
    ATTN_PARAM_KEYS = frozenset(
        {"wq", "wq_a", "q_norm", "wq_b", "wkv_a", "kv_norm", "w_uk", "w_uv", "wo"}
    )
    dp_attention: bool = False
    # V3 routing: sigmoid scores + per-expert correction bias ("noaux_tc",
    # HF DeepseekV3TopkRouter). Class attr on V2 so a V2-architecture config
    # carrying topk_method="noaux_tc" also routes correctly.
    noaux_tc = False

    def __init__(self, cfg: ModelConfig):
        assert cfg.is_mla, "DeepseekV2 requires kv_lora_rank (MLA)"
        self.cfg = cfg
        if cfg.topk_method == "noaux_tc":
            self.noaux_tc = True
        # rope applies only to the qk_rope dims; a temporary config view
        # keeps compute_inv_freq's head_dim handling intact
        import dataclasses as _dc

        self.inv_freq = compute_inv_freq(
            _dc.replace(cfg, head_dim=cfg.qk_rope_head_dim)
        )
        self.rope_scale = _yarn_rope_scale(cfg.rope_scaling)
        qk_head = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
        self.sm_scale = float(qk_head) ** -0.5
        self.n_dense = cfg.first_k_dense_replace if cfg.num_experts else (
            cfg.num_hidden_layers
        )
        self.n_moe = cfg.num_hidden_layers - self.n_dense

    @property
    def mla_latent_dim(self) -> int:
        return self.cfg.kv_lora_rank + self.cfg.qk_rope_head_dim

    # ------------------------------------------------------------ parameters

    def _attn_shapes(self):
        cfg = self.cfg
        H = cfg.hidden_size
        Hq = cfg.num_attention_heads
        dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
        r, qr = cfg.kv_lora_rank, cfg.q_lora_rank
        shapes = {
            "input_norm": (H,),
            "post_norm": (H,),
            "wkv_a": (H, r + dr),
            "kv_norm": (r,),
            "w_uk": (Hq, dn, r),
            "w_uv": (Hq, r, dv),
            "wo": (Hq * dv, H),
        }
        if qr:
            shapes.update(
                wq_a=(H, qr), q_norm=(qr,), wq_b=(qr, Hq * (dn + dr))
            )
        else:
            shapes["wq"] = (H, Hq * (dn + dr))
        return shapes

    def init_params(self, rng: jax.Array, dtype=jnp.bfloat16) -> dict[str, Any]:
        cfg = self.cfg
        H, V = cfg.hidden_size, cfg.vocab_size
        I = cfg.intermediate_size
        Im = cfg.moe_intermediate_size or I
        E = cfg.num_experts
        key = [rng]

        def nxt():
            key[0], sub = jax.random.split(key[0])
            return sub

        def init(shape):
            if len(shape) == 1:
                return jnp.ones(shape, dtype)
            return (
                jax.random.normal(nxt(), shape, jnp.float32)
                / np.sqrt(shape[-2] if len(shape) > 1 else 1)
            ).astype(dtype)

        def attn_group(L):
            return {
                k: jnp.stack([init(s) for _ in range(L)])
                for k, s in self._attn_shapes().items()
            }

        params: dict[str, Any] = {"embed": init((V, H))}
        if self.n_dense:
            g = attn_group(self.n_dense)
            g.update(
                gate=jnp.stack([init((H, I)) for _ in range(self.n_dense)]),
                up=jnp.stack([init((H, I)) for _ in range(self.n_dense)]),
                down=jnp.stack([init((I, H)) for _ in range(self.n_dense)]),
            )
            params["layers_dense"] = g
        if self.n_moe:
            L = self.n_moe
            g = attn_group(L)
            Is = Im * max(cfg.n_shared_experts, 1)
            g.update(
                router=jnp.stack([init((H, E)) for _ in range(L)]),
                shared_gate=jnp.stack([init((H, Is)) for _ in range(L)]),
                shared_up=jnp.stack([init((H, Is)) for _ in range(L)]),
                shared_down=jnp.stack([init((Is, H)) for _ in range(L)]),
                w1=jnp.stack(
                    [jnp.stack([init((H, Im)) for _ in range(E)]) for _ in range(L)]
                ),
                w3=jnp.stack(
                    [jnp.stack([init((H, Im)) for _ in range(E)]) for _ in range(L)]
                ),
                w2=jnp.stack(
                    [jnp.stack([init((Im, H)) for _ in range(E)]) for _ in range(L)]
                ),
            )
            if self.noaux_tc:
                # kept in f32: HF selects experts with the f32 correction
                # bias, and a bf16 cast can flip near-tie expert choices
                g["router_bias"] = jnp.zeros((L, E), jnp.float32)
            params["layers"] = g
        params["final_norm"] = jnp.ones((H,), dtype)
        if not cfg.tie_word_embeddings:
            params["lm_head"] = init((V, H))
        return params

    def param_specs(self, tp_axis: str = "tp") -> dict[str, Any]:
        t = tp_axis
        qr = self.cfg.q_lora_rank

        def attn_specs():
            s = {
                "input_norm": P(None, None),
                "post_norm": P(None, None),
                "wkv_a": P(None, None, None),  # latent path is replicated
                "kv_norm": P(None, None),
                "w_uk": P(None, t, None, None),  # shard q heads
                "w_uv": P(None, t, None, None),
                "wo": P(None, t, None),
            }
            if qr:
                s.update(
                    wq_a=P(None, None, None),
                    q_norm=P(None, None),
                    wq_b=P(None, None, t),
                )
            else:
                s["wq"] = P(None, None, t)
            return s

        specs: dict[str, Any] = {"embed": P(t, None)}
        if self.n_dense:
            g = attn_specs()
            g.update(
                gate=P(None, None, t), up=P(None, None, t), down=P(None, t, None)
            )
            specs["layers_dense"] = g
        if self.n_moe:
            g = attn_specs()
            g.update(
                router=P(None, None, None),
                shared_gate=P(None, None, t),
                shared_up=P(None, None, t),
                shared_down=P(None, t, None),
                w1=P(None, None, None, t),
                w3=P(None, None, None, t),
                w2=P(None, None, t, None),
            )
            if self.noaux_tc:
                g["router_bias"] = P(None, None)
            specs["layers"] = g
        specs["final_norm"] = P(None)
        if not self.cfg.tie_word_embeddings:
            specs["lm_head"] = P(t, None)
        return specs

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.bfloat16):
        cfg = self.cfg
        dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
        Hq = cfg.num_attention_heads
        E = cfg.num_experts
        dense: dict[str, list] = {}
        moe: dict[str, list] = {}
        out: dict[str, Any] = {}

        def bucket(l):
            return (dense, l) if l < self.n_dense else (moe, l - self.n_dense)

        def put(group, tgt, i, w, L, e=None):
            if e is None:
                group.setdefault(tgt, [None] * L)[i] = w
            else:
                group.setdefault(tgt, [[None] * E for _ in range(L)])[i][e] = w

        for name, w in state.items():
            if not name.startswith("model.layers."):
                if name == "model.embed_tokens.weight":
                    out["embed"] = w
                elif name == "model.norm.weight":
                    out["final_norm"] = w
                elif name == "lm_head.weight":
                    if not cfg.tie_word_embeddings:
                        out["lm_head"] = w
                else:
                    raise KeyError(f"unmapped HF weight {name}")
                continue
            rest = name[len("model.layers.") :]
            l_s, sub = rest.split(".", 1)
            l = int(l_s)
            group, i = bucket(l)
            L = self.n_dense if group is dense else self.n_moe
            if sub == "self_attn.q_proj.weight":
                put(group, "wq", i, w.T, L)
            elif sub == "self_attn.q_a_proj.weight":
                put(group, "wq_a", i, w.T, L)
            elif sub == "self_attn.q_a_layernorm.weight":
                put(group, "q_norm", i, w, L)
            elif sub == "self_attn.q_b_proj.weight":
                put(group, "wq_b", i, w.T, L)
            elif sub == "self_attn.kv_a_proj_with_mqa.weight":
                put(group, "wkv_a", i, w.T, L)
            elif sub == "self_attn.kv_a_layernorm.weight":
                put(group, "kv_norm", i, w, L)
            elif sub == "self_attn.kv_b_proj.weight":
                kvb = w.reshape(Hq, dn + dv, -1)  # [Hq, dn+dv, r]
                put(group, "w_uk", i, kvb[:, :dn, :], L)
                put(group, "w_uv", i, kvb[:, dn:, :].transpose(0, 2, 1), L)
            elif sub == "self_attn.o_proj.weight":
                put(group, "wo", i, w.T, L)
            elif sub == "input_layernorm.weight":
                put(group, "input_norm", i, w, L)
            elif sub == "post_attention_layernorm.weight":
                put(group, "post_norm", i, w, L)
            elif sub == "mlp.gate_proj.weight":
                put(group, "gate", i, w.T, L)
            elif sub == "mlp.up_proj.weight":
                put(group, "up", i, w.T, L)
            elif sub == "mlp.down_proj.weight":
                put(group, "down", i, w.T, L)
            elif sub == "mlp.gate.weight":
                put(group, "router", i, w.T, L)
            elif sub == "mlp.gate.e_score_correction_bias":
                put(group, "router_bias", i, w, L)
            elif sub.startswith("mlp.shared_experts."):
                which = sub.split(".")[2]
                tgt = {
                    "gate_proj": "shared_gate",
                    "up_proj": "shared_up",
                    "down_proj": "shared_down",
                }[which]
                put(group, tgt, i, w.T, L)
            elif sub.startswith("mlp.experts."):
                parts = sub.split(".")
                e, which = int(parts[2]), parts[3]
                tgt = {"gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"}[
                    which
                ]
                put(group, tgt, i, w.T, L, e)
            else:
                raise KeyError(f"unmapped HF weight {name}")

        def stack(group):
            res = {}
            for k, ws in group.items():
                if k in ("w1", "w2", "w3"):
                    res[k] = np.stack([np.stack(row) for row in ws])
                else:
                    assert all(x is not None for x in ws), f"missing {k}"
                    res[k] = np.stack(ws)
            return res

        if dense:
            out["layers_dense"] = stack(dense)
        if moe:
            out["layers"] = stack(moe)

        def _cast(path, x):
            # router_bias (e_score_correction_bias) stays f32 — it is only
            # [L, E] and HF picks experts with the f32 bias; casting it to
            # bf16 can flip near-tie expert selection vs HF.
            if any(getattr(p, "key", None) == "router_bias" for p in path):
                return jnp.asarray(x, jnp.float32)
            return jnp.asarray(x, dtype)

        return jax.tree_util.tree_map_with_path(_cast, out)

    # ---------------------------------------------------------------- forward

    def _attention(self, x, lp, lidx, kv_c, meta, T):
        cfg = self.cfg
        Hq = cfg.num_attention_heads
        dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
        r = cfg.kv_lora_rank
        inv_freq = jnp.asarray(self.inv_freq)

        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        if cfg.q_lora_rank:
            q = rms_norm(h @ lp["wq_a"], lp["q_norm"], cfg.rms_norm_eps) @ lp[
                "wq_b"
            ]
        else:
            q = h @ lp["wq"]
        # DP attention: the single latent kv "head" cannot shard over tp, so
        # replicated attention weights + (dp, tp)-sharded rows is the only
        # way tp devices help with attention at all for MLA
        dpa_mesh = self.mesh if getattr(self, "dp_attention", False) else None
        q = shard_rows(q.reshape(T, Hq, dn + dr), dpa_mesh, ("dp", "tp"))
        q_nope, q_rope = q[..., :dn], q[..., dn:]
        q_rope = apply_rope_interleaved(
            q_rope, meta.positions, inv_freq, self.rope_scale
        )

        ckv_rope = h @ lp["wkv_a"]  # [T, r+dr]
        c_kv = rms_norm(ckv_rope[:, :r], lp["kv_norm"], cfg.rms_norm_eps)
        k_rope = apply_rope_interleaved(
            ckv_rope[:, None, r:], meta.positions, inv_freq, self.rope_scale
        )[:, 0]
        kv_c = write_latent(
            kv_c,
            jnp.concatenate([c_kv, k_rope], axis=-1),
            lidx,
            meta.out_cache_loc,
        )

        # absorb W_UK into the query -> latent-space scores
        q_lat = jnp.einsum("thn,hnr->thr", q_nope, lp["w_uk"])
        out_lat = mla_attention_xla(
            q_lat, q_rope, kv_c, lidx, meta,
            page_size=self.page_size, sm_scale=self.sm_scale,
        )
        attn = shard_rows(
            jnp.einsum("thr,hrv->thv", out_lat, lp["w_uv"]),
            dpa_mesh,
            ("dp", "tp"),
        )
        out = x + attn.reshape(T, Hq * dv) @ lp["wo"]
        # row gather at the attention/MoE boundary: back to dp rows so the
        # experts run tensor-parallel over tp
        return shard_rows(out, dpa_mesh, "dp"), kv_c

    def _moe(self, h: jax.Array, lp: dict) -> jax.Array:
        cfg = self.cfg
        E, K = cfg.num_experts, cfg.num_experts_per_tok
        logits = (h.astype(jnp.float32) @ lp["router"].astype(jnp.float32))
        if self.noaux_tc:
            # HF DeepseekV3TopkRouter: sigmoid scores; group selection and
            # expert choice use bias-corrected scores (sum of each group's
            # top-2), but the combine WEIGHTS are the unbiased scores,
            # renormalised over the chosen K and scaled.
            T = h.shape[0]
            scores = jax.nn.sigmoid(logits)
            biased = scores + lp["router_bias"].astype(jnp.float32)[None, :]
            g = biased.reshape(T, cfg.n_group, -1)
            top2, _ = jax.lax.top_k(g, 2)
            g_best = jnp.sum(top2, axis=-1)  # [T, n_group]
            _, g_idx = jax.lax.top_k(g_best, cfg.topk_group)
            g_mask = jnp.sum(
                jax.nn.one_hot(g_idx, cfg.n_group, dtype=jnp.float32), axis=1
            )
            mask = jnp.repeat(g_mask, E // cfg.n_group, axis=-1)
            choice = jnp.where(mask > 0, biased, 0.0)  # HF masked_fill(0.0)
            _, topi = jax.lax.top_k(choice, K)
            topv = jnp.take_along_axis(scores, topi, axis=-1)
            if cfg.norm_topk_prob:
                topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
            topv = topv * cfg.routed_scaling_factor
        else:
            scores = jax.nn.softmax(logits, axis=-1)
            if cfg.topk_method == "group_limited_greedy":
                T = h.shape[0]
                g = scores.reshape(T, cfg.n_group, -1)
                g_best = jnp.max(g, axis=-1)  # [T, n_group]
                _, g_idx = jax.lax.top_k(g_best, cfg.topk_group)
                g_mask = jnp.sum(
                    jax.nn.one_hot(g_idx, cfg.n_group, dtype=jnp.float32), axis=1
                )  # [T, n_group]
                mask = jnp.repeat(g_mask, E // cfg.n_group, axis=-1)
                scores = scores * mask
            topv, topi = jax.lax.top_k(scores, K)
            # HF DeepseekV2MoEGate: NO topk renormalisation, just the scale
            topv = topv * cfg.routed_scaling_factor
        w_full = jnp.zeros((h.shape[0], E), jnp.float32)
        for k in range(K):
            w_full = w_full + jax.nn.one_hot(topi[:, k], E) * topv[:, k : k + 1]
        y = jnp.zeros_like(h)
        for e in range(E):
            contrib = silu_mul(h @ lp["w1"][e], h @ lp["w3"][e]) @ lp["w2"][e]
            y = y + contrib * w_full[:, e : e + 1].astype(h.dtype)
        shared = (
            silu_mul(h @ lp["shared_gate"], h @ lp["shared_up"])
            @ lp["shared_down"]
        )
        return y + shared

    def __call__(self, params: dict, kv: KVCache, meta: ForwardMeta):
        cfg = self.cfg
        T = meta.num_tokens
        x = jnp.take(params["embed"], meta.tokens, axis=0)

        if self.n_dense:
            def dense_body(carry, layer):
                x, kv_c = carry
                lp, lidx = layer
                x, kv_c = self._attention(x, lp, lidx, kv_c, meta, T)
                h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
                x = x + silu_mul(h2 @ lp["gate"], h2 @ lp["up"]) @ lp["down"]
                return (x, kv_c), None

            from scratchpad_tpu.models.common import scan_layers

            (x, kv), _ = scan_layers(
                dense_body,
                (x, kv),
                (
                    params["layers_dense"],
                    np.arange(self.n_dense, dtype=np.int32),
                ),
            )

        if self.n_moe:
            def moe_body(carry, layer):
                x, kv_c = carry
                lp, lidx = layer
                x, kv_c = self._attention(x, lp, lidx, kv_c, meta, T)
                h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
                x = x + self._moe(h2, lp)
                return (x, kv_c), None

            from scratchpad_tpu.models.common import scan_layers

            (x, kv), _ = scan_layers(
                moe_body,
                (x, kv),
                (
                    params["layers"],
                    self.n_dense + np.arange(self.n_moe, dtype=np.int32),
                ),
            )

        h = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        if getattr(meta, "capture_all_hidden", False):
            return kv, h
        if getattr(meta, "capture_hidden", False):
            return kv, jnp.take(h, meta.last_token_idx, axis=0)
        last = jnp.take(h, meta.last_token_idx, axis=0)
        head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
        logits = (last @ head.T).astype(jnp.float32)
        return kv, logits


class DeepseekV3ForCausalLM(DeepseekV2ForCausalLM):
    """V3/R1: V2's MLA attention + the sigmoid noaux-tc router (HF
    DeepseekV3TopkRouter) with the per-expert e_score_correction_bias."""

    noaux_tc = True