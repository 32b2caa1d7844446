"""Shared functional building blocks for models.

Replaces the reference's nn.Module layer zoo (scratchpad/nn/layers/) with pure
functions over param pytrees — idiomatic for jit/scan. Tensor-parallel layout
is expressed via PartitionSpec trees (see each model's param_specs), not via
distinct Column/RowParallelLinear classes; XLA inserts the collectives.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def init_stacked_lean(seed: int, shape, scale_dim: int, dtype) -> jax.Array:
    """Random-init a big stacked tensor WITHOUT a whole-array f32
    intermediate: numpy fills one leading slice at a time in f16, then one
    cast to the serving dtype. A 20B-class MoE expert stack ([24, 32, 2880,
    5760]) peaks at ~2.5 bytes/elem here instead of the 12+ bytes/elem of
    a single jax.random.normal jit (which OOMed a 125 GB host)."""
    rng = np.random.default_rng(seed)
    out = np.empty(shape, np.float16)
    inv = np.float32(1.0 / np.sqrt(scale_dim))
    for l in range(shape[0]):
        out[l] = (
            rng.standard_normal(shape[1:], np.float32) * inv
        ).astype(np.float16)
    return jnp.asarray(out, dtype)


def make_quant_matmul():
    """Per-layer W4A16 matmul: Pallas on accelerators, XLA reference path on
    CPU (SPTPU_W4_IMPL=xla forces the XLA fused-dequant path for A/B
    tests). Shared by every model class that supports quantization."""
    import os

    if jax.default_backend() == "cpu" or os.environ.get("SPTPU_W4_IMPL") == "xla":
        from scratchpad_tpu.ops.quant import slice_layer, w4a16_matmul_xla

        return lambda x, ql, l: w4a16_matmul_xla(x, slice_layer(ql, l))
    from scratchpad_tpu.ops.quant.pallas_w4 import (
        Quantized4bit,
        w4_matmul_4bit,
        w4a16_matmul_pallas,
    )

    def dispatch(x, ql, l):
        if isinstance(ql, Quantized4bit):  # 4-bit-native storage opt-in
            return w4_matmul_4bit(x, ql, l, a8=False)
        return w4a16_matmul_pallas(x, ql, l)

    return dispatch


def make_w4a8_quant_matmul():
    """Per-layer W4A8 matmul (int8 activations on the s8 MXU): Pallas on
    accelerators, XLA reference path on CPU or with SPTPU_W4_IMPL=xla —
    the same A/B-debug escape hatch the w4a16 path honors (ADVICE r3)."""
    import os

    if jax.default_backend() == "cpu" or os.environ.get("SPTPU_W4_IMPL") == "xla":
        from scratchpad_tpu.ops.quant import slice_layer, w4a8_matmul_xla

        return lambda x, ql, l: w4a8_matmul_xla(x, slice_layer(ql, l))
    from scratchpad_tpu.ops.quant.pallas_w4 import (
        Quantized4bit,
        w4_matmul_4bit,
        w4a16_matmul_pallas,
        w4a8_matmul_pallas,
    )

    # SPTPU_W4A8_EXTEND=a16: route prefill-sized batches (> 256 rows,
    # above every decode bs bucket) through the A16 kernel — extend is
    # MXU-bound, so the per-token activation-quantize + gsum work that
    # pays for int8 dots at decode can exceed its win there (1B W4A8
    # prefill MFU 0.45 vs bf16 0.51, VERDICT r4 item 6). Numerics only
    # improve (activations stay bf16). Static per trace: row count is a
    # bucket constant.
    ext_a16 = os.environ.get("SPTPU_W4A8_EXTEND", "a8") == "a16"

    def dispatch(x, ql, l):
        a8 = not (ext_a16 and x.shape[0] > 256)
        if isinstance(ql, Quantized4bit):  # 4-bit-native storage opt-in
            return w4_matmul_4bit(x, ql, l, a8=a8)
        if a8:
            return w4a8_matmul_pallas(x, ql, l)
        return w4a16_matmul_pallas(x, ql, l)

    return dispatch


def dp_attention_respec(specs: dict, attn_keys: frozenset) -> dict:
    """Replicate attention weights for DP attention.

    Rewrites every ``layers*`` group's attention-parameter specs to
    all-``None`` (fully replicated) so each device attends over its own
    token rows with FULL kv heads; MLP/router specs keep their tp sharding.
    (Reference analogue: enable_dp_attention flag, scratchpad/server/args.py:68
    — plumbing only there; this is the executing version.)
    """
    from jax.sharding import PartitionSpec as P

    for gname, group in specs.items():
        if not gname.startswith("layers") or not isinstance(group, dict):
            continue
        for name, spec in group.items():
            if name in attn_keys:
                group[name] = P(*([None] * len(spec)))
    return specs


def shard_rows(x, mesh, axes):
    """Constrain the leading (token) dim of ``x`` over ``axes`` of ``mesh``.

    No-op when mesh is None. Used by DP attention to pin attention
    computation to (dp, tp)-sharded rows and the residual stream to
    dp-sharded rows; XLA materialises the boundary collectives."""
    if mesh is None or x is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axes, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMSNorm (reference: scratchpad/nn/layers/layernorm.py:12)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def silu_mul(gate: jax.Array, up: jax.Array) -> jax.Array:
    """SiluAndMul (reference: scratchpad/nn/layers/activation.py:21)."""
    return jax.nn.silu(gate) * up


def gelu_mul(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.gelu(gate, approximate=True) * up


def compute_inv_freq(cfg) -> np.ndarray:
    """Rotary inverse frequencies incl. Llama-3 scaling.

    Host-side (numpy) precompute; the reference's full rope family lives in
    scratchpad/nn/layers/rotary_embedding.py — on TPU we bake scaling into
    inv_freq and apply rope on the fly inside the jitted step.
    """
    head_dim = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    rs = cfg.rope_scaling
    if rs:
        rope_type = rs.get("rope_type", rs.get("type", "default"))
        if rope_type == "llama3":
            factor = rs["factor"]
            low = rs["low_freq_factor"]
            high = rs["high_freq_factor"]
            orig = rs["original_max_position_embeddings"]
            wavelen = 2 * np.pi / inv_freq
            # three bands: scale long wavelengths, keep short, smooth between
            smooth = (orig / wavelen - low) / (high - low)
            smooth = np.clip(smooth, 0.0, 1.0)
            scaled = inv_freq / factor
            blended = (1 - smooth) * scaled + smooth * inv_freq
            inv_freq = np.where(wavelen > orig / low, scaled, inv_freq)
            mid = (wavelen <= orig / low) & (wavelen >= orig / high)
            inv_freq = np.where(mid, blended, inv_freq)
        elif rope_type in ("linear",):
            inv_freq = inv_freq / rs["factor"]
        elif rope_type == "yarn":
            # YaRN (public recipe, as in HF modeling_rope_utils):
            # interpolate low-frequency dims by `factor`, keep high-frequency
            # dims, linear-ramp between correction dims set by beta_fast/slow
            factor = rs["factor"]
            orig = rs.get(
                "original_max_position_embeddings",
                getattr(cfg, "max_position_embeddings", 4096),
            )
            beta_fast = rs.get("beta_fast", 32.0)
            beta_slow = rs.get("beta_slow", 1.0)
            dim, base = head_dim, cfg.rope_theta

            def corr_dim(rot):
                return (dim * np.log(orig / (rot * 2 * np.pi))) / (
                    2 * np.log(base)
                )

            low = max(int(np.floor(corr_dim(beta_fast))), 0)
            high = min(int(np.ceil(corr_dim(beta_slow))), dim - 1)
            ramp = np.clip(
                (np.arange(dim // 2, dtype=np.float64) - low)
                / max(high - low, 0.001),
                0.0,
                1.0,
            )
            extrap_mask = 1.0 - ramp  # 1 = keep original (high freq)
            inv_freq = (inv_freq / factor) * (
                1 - extrap_mask
            ) + inv_freq * extrap_mask
        elif rope_type == "longrope":
            # Phi-3 longrope: per-dim rescale factors; the long list applies
            # when the deployed context exceeds the original pretraining one
            orig = rs.get(
                "original_max_position_embeddings",
                cfg.max_position_embeddings,
            )
            use_long = cfg.max_position_embeddings > orig
            ext = np.asarray(
                rs["long_factor"] if use_long else rs["short_factor"],
                np.float64,
            )
            inv_freq = inv_freq / ext
        elif rope_type in ("default", "dynamic", "mrope"):
            # dynamic recomputation not needed: serving contexts are bounded
            # by max_position_embeddings at startup
            pass
    return inv_freq.astype(np.float32)


def rope_attention_scale(cfg) -> float:
    """Extra attention-logit multiplier some rope scalings require.

    YaRN scales cos/sin by mscale = 0.1*ln(factor)+1 (applied to BOTH q and
    k in HF, i.e. logits scale by mscale^2); folding it into sm_scale is
    equivalent and free. longrope similarly uses
    sqrt(1 + ln(factor)/ln(orig)). Default 1.0."""
    rs = cfg.rope_scaling
    if not rs:
        return 1.0
    rope_type = rs.get("rope_type", rs.get("type", "default"))
    if rope_type == "yarn":
        if rs.get("attention_factor") is not None:
            return float(rs["attention_factor"]) ** 2
        return float(0.1 * np.log(rs["factor"]) + 1.0) ** 2
    if rope_type == "longrope":
        orig = rs.get(
            "original_max_position_embeddings", cfg.max_position_embeddings
        )
        factor = cfg.max_position_embeddings / max(orig, 1)
        if factor <= 1.0:
            return 1.0
        return 1.0 + np.log(factor) / np.log(orig)
    return 1.0


def apply_rope(
    x: jax.Array,  # [T, H, D]
    positions: jax.Array,  # i32[T]
    inv_freq: jax.Array,  # f32[D/2]
) -> jax.Array:
    """Non-interleaved (rotate_half) rope, HF Llama convention."""
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, D/2]
    cos = jnp.cos(angles)[:, None, :]  # [T, 1, D/2]
    sin = jnp.sin(angles)[:, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(x.dtype)


def mrope_channel_components(mrope_section: list[int], head_dim: int) -> np.ndarray:
    """Per-FULL-channel component index (0=t, 1=h, 2=w) for multimodal rope.

    HF splits the *doubled* cos/sin (cat(freqs, freqs), size head_dim) into
    chunks of the section list repeated twice, assigning components
    round-robin — so the pattern has period head_dim/2 and rotate-half pairs
    (j, j+head_dim/2) share a component (reference equivalent:
    scratchpad/nn/layers/rotary_embedding.py:723 MRotaryEmbedding; HF
    qwen2_vl.apply_multimodal_rotary_pos_emb)."""
    comp = np.zeros(head_dim, np.int32)
    o = 0
    for i, s in enumerate(list(mrope_section) * 2):
        comp[o : o + s] = i % 3
        o += s
    assert o == head_dim, (mrope_section, head_dim)
    return comp


def apply_mrope(
    x: jax.Array,  # [T, H, D]
    mpos: jax.Array,  # i32[3, T] (t, h, w) positions
    inv_freq: jax.Array,  # f32[D/2]
    comp: jax.Array,  # i32[D] channel -> component map
) -> jax.Array:
    """Multimodal 3-D rope (Qwen2-VL). Equals apply_rope when the three
    position components are identical (pure-text rows)."""
    D = x.shape[-1]
    inv_full = jnp.concatenate([inv_freq, inv_freq])  # [D]
    pos_c = mpos.astype(jnp.float32)[comp, :]  # [D, T]
    ang = pos_c.T * inv_full[None, :]  # [T, D]
    cos = jnp.cos(ang)[:, None, :]
    sin = jnp.sin(ang)[:, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos + rot * sin).astype(x.dtype)


def apply_rope_interleaved(
    x: jax.Array,  # [T, H, D]
    positions: jax.Array,  # i32[T]
    inv_freq: jax.Array,  # f32[D/2]
    scale: float = 1.0,
) -> jax.Array:
    """Complex/adjacent-pair rope (DeepSeek convention): pairs
    (x[2j], x[2j+1]) rotate by pos * inv_freq[j]; HF multiplies freqs_cis by
    an attention scaling factor, folded here via ``scale`` on cos/sin."""
    ang = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    cos = (jnp.cos(ang) * scale)[:, None, :]  # [T, 1, D/2]
    sin = (jnp.sin(ang) * scale)[:, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., 0::2], xf[..., 1::2]
    o1 = x1 * cos - x2 * sin
    o2 = x1 * sin + x2 * cos
    out = jnp.stack([o1, o2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def scan_layers(body, carry, xs):
    """Run a decoder ``body`` over stacked per-layer xs.

    Default: a python-unrolled loop — static a[l] views let XLA fuse the
    weight reads in place, and host-side numpy ids/flags in ``xs`` reach
    the body as CONCRETE values (the attention kernels then fold layer
    page offsets and sliding windows in statically; see
    ops/attention/gqa_decode.py static_layer). SPTPU_LAYER_SCAN=1 restores
    lax.scan for depth-independent trace/compile time.
    """
    import os

    if os.environ.get("SPTPU_LAYER_SCAN", "0") == "1":
        xs = jax.tree.map(jnp.asarray, xs)
        return jax.lax.scan(body, carry, xs)
    n = jax.tree.leaves(xs)[0].shape[0]
    for l in range(n):
        sl = jax.tree.map(lambda a: a[l], xs)
        carry, _ = body(carry, sl)
    return carry, None
