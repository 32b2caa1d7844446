"""LoRA toppings: per-request adapters must equal merged-weight results."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import get_preset
from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.server.engine import Engine


def make_lora_state(cfg, rank, seed, targets=("q_proj", "gate_proj")):
    """peft-style state dict for all layers of the given targets."""
    rng = np.random.default_rng(seed)
    dims = {
        "q_proj": (cfg.hidden_size, cfg.num_attention_heads * cfg.head_dim),
        "gate_proj": (cfg.hidden_size, cfg.intermediate_size),
        "down_proj": (cfg.intermediate_size, cfg.hidden_size),
    }
    state = {}
    for l in range(cfg.num_hidden_layers):
        for t in targets:
            din, dout = dims[t]
            a = (rng.normal(size=(rank, din)) * 0.3).astype(np.float32)
            b = (rng.normal(size=(dout, rank)) * 0.3).astype(np.float32)
            prefix = f"base_model.model.model.layers.{l}.self_attn.{t}" if t == "q_proj" else f"base_model.model.model.layers.{l}.mlp.{t}"
            state[f"{prefix}.lora_A.weight"] = a
            state[f"{prefix}.lora_B.weight"] = b
    return state


TARGET_TO_NAME = {"q_proj": "wq", "gate_proj": "gate", "down_proj": "down"}


def merge_into_params(params, cfg, state, scaling):
    """Dense-merge the adapter for a reference engine."""
    import jax

    layers = dict(params["layers"])
    for key, w in state.items():
        if ".lora_A." not in key:
            continue
        parts = key.split(".layers.")[1]
        l = int(parts.split(".")[0])
        for hf, ours in TARGET_TO_NAME.items():
            if f"{hf}.lora_A" in key:
                a = w  # [r, in]
                b = state[key.replace("lora_A", "lora_B")]  # [out, r]
                delta = (b @ a).T * scaling  # [in, out]
                layers[ours] = layers[ours].at[l].add(jnp.asarray(delta, layers[ours].dtype))
    return {**params, "layers": layers}


@pytest.fixture(scope="module")
def base_engine():
    args = ServerArgs(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
    )
    return Engine(args)


def prompt(n, seed=0):
    return np.random.default_rng(seed).integers(1, 500, n).tolist()


class TestToppings:
    def test_adapter_changes_output_and_matches_merged(self, base_engine):
        eng = base_engine
        cfg = eng.model_config
        state = make_lora_state(cfg, rank=4, seed=10)
        eng.register_topping("ad1", state=state, scaling=0.5)
        p = prompt(12, seed=1)
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)

        base_out = eng.generate(input_ids=p, sampling_params=sp)
        lora_out = eng.generate(input_ids=p, sampling_params=sp, topping="ad1")
        assert lora_out.output_ids != base_out.output_ids  # adapter has effect

        # merged-weight reference engine
        merged = merge_into_params(
            eng.scheduler.runner.params, cfg, state, scaling=0.5
        )
        merged.pop("toppings", None)
        args = ServerArgs(
            preset="tiny-debug", random_weights=True, dtype="float32",
            page_size=4, max_total_tokens=2048,
        )
        from scratchpad_tpu.core.scheduler import Scheduler
        from scratchpad_tpu.executor.model_runner import ModelRunner

        runner = ModelRunner(cfg, args, params=merged)
        ref_eng = Engine(args, model_config=cfg)
        ref_eng.scheduler = Scheduler(cfg, args, runner=runner)
        ref_out = ref_eng.generate(input_ids=p, sampling_params=sp)
        assert lora_out.output_ids == ref_out.output_ids

    def test_mixed_batch_isolation(self, base_engine):
        """Adapter rows must not leak into other requests in the batch."""
        eng = base_engine
        cfg = eng.model_config
        eng.register_topping(
            "ad2", state=make_lora_state(cfg, rank=4, seed=20), scaling=0.7
        )
        sp = SamplingParams(temperature=0.0, max_new_tokens=5)
        prompts = [prompt(10, seed=i) for i in range(3)]
        toppings = [None, "ad1", "ad2"]
        solo = [
            eng.generate(input_ids=p, sampling_params=sp, topping=t).output_ids
            for p, t in zip(prompts, toppings)
        ]
        eng.flush_cache()
        outs = eng.generate(
            input_ids=prompts, sampling_params=[sp] * 3, topping=toppings
        )
        assert [o.output_ids for o in outs] == solo
        eng.scheduler.check_memory_leak()


def make_delta_state(cfg, seed, scale=0.002, targets=("q_proj", "gate_proj")):
    """HF-named full-rank weight deltas, crafted exactly int8-representable
    (per-out-channel max |q| = 127) so quantized serving is bit-exact."""
    rng = np.random.default_rng(seed)
    dims = {
        "q_proj": (cfg.hidden_size, cfg.num_attention_heads * cfg.head_dim),
        "gate_proj": (cfg.hidden_size, cfg.intermediate_size),
    }
    state = {}
    for l in range(cfg.num_hidden_layers):
        for t in targets:
            din, dout = dims[t]
            q = rng.integers(-127, 128, (dout, din)).astype(np.float32)
            q[:, 0] = 127  # pin per-channel amax so scale == `scale` exactly
            mod = "self_attn" if t == "q_proj" else "mlp"
            state[f"model.layers.{l}.{mod}.{t}.weight"] = q * scale
    return state


class TestDeltaToppings:
    def test_delta_adapter_matches_merged(self, base_engine):
        eng = base_engine
        cfg = eng.model_config
        state = make_delta_state(cfg, seed=30)
        eng.register_topping("dl1", delta_state=state, scaling=1.0)
        p = prompt(12, seed=3)
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)

        base_out = eng.generate(input_ids=p, sampling_params=sp)
        delta_out = eng.generate(input_ids=p, sampling_params=sp, topping="dl1")
        assert delta_out.output_ids != base_out.output_ids

        # reference: serve W_base + delta merged densely
        layers = dict(eng.scheduler.runner.params["layers"])
        for key, w in state.items():
            l = int(key.split(".layers.")[1].split(".")[0])
            t = "wq" if "q_proj" in key else "gate"
            layers[t] = layers[t].at[l].add(jnp.asarray(w.T, layers[t].dtype))
        merged = {**eng.scheduler.runner.params, "layers": layers}
        merged.pop("toppings", None)
        args = ServerArgs(
            preset="tiny-debug", random_weights=True, dtype="float32",
            page_size=4, max_total_tokens=2048,
        )
        from scratchpad_tpu.core.scheduler import Scheduler
        from scratchpad_tpu.executor.model_runner import ModelRunner

        runner = ModelRunner(cfg, args, params=merged)
        ref_eng = Engine(args, model_config=cfg)
        ref_eng.scheduler = Scheduler(cfg, args, runner=runner)
        ref_out = ref_eng.generate(input_ids=p, sampling_params=sp)
        assert delta_out.output_ids == ref_out.output_ids

    def test_mixed_lora_delta_batch(self, base_engine):
        """One batch mixing no-adapter, LoRA and delta rows: each must match
        its solo run (mask isolation across adapter kinds)."""
        eng = base_engine
        sp = SamplingParams(temperature=0.0, max_new_tokens=5)
        prompts = [prompt(9, seed=40 + i) for i in range(3)]
        toppings = [None, "ad1", "dl1"]
        solo = [
            eng.generate(input_ids=p, sampling_params=sp, topping=t).output_ids
            for p, t in zip(prompts, toppings)
        ]
        eng.flush_cache()
        outs = eng.generate(
            input_ids=prompts, sampling_params=[sp] * 3, topping=toppings
        )
        assert [o.output_ids for o in outs] == solo
        eng.scheduler.check_memory_leak()


class TestLdmmKernel:
    """Grouped adapter matmul (ops/ldmm.py) vs the masked-dense reference."""

    def _inputs(self, T=40, In=128, Out=256, N=4, L=2, r=8, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal((T, In), np.float32)
        dq = rng.integers(-127, 128, (N, L, In, Out)).astype(np.int8)
        ds = (rng.random((N, L, Out), np.float32) * 0.02).astype(np.float32)
        slots = rng.integers(0, 3, T).astype(np.int32)  # slot per token
        return x, dq, ds, slots

    def test_delta_kernel_matches_xla(self):
        import jax.numpy as jnp
        from scratchpad_tpu.ops.ldmm import delta_matmul, delta_matmul_xla

        x, dq, ds, slots = self._inputs()
        aid = jnp.asarray(2, jnp.int32)
        layer = jnp.asarray(1, jnp.int32)
        ms = (slots == 2).astype(np.float32) * 0.5
        got = delta_matmul(
            jnp.asarray(x), jnp.asarray(dq), jnp.asarray(ds),
            aid, layer, jnp.asarray(ms), interpret=True,
        )
        want = delta_matmul_xla(
            jnp.asarray(x), jnp.asarray(dq), jnp.asarray(ds),
            aid, layer, jnp.asarray(ms),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_delta_kernel_zero_slot_is_noop(self):
        import jax.numpy as jnp
        from scratchpad_tpu.ops.ldmm import delta_matmul

        x, dq, ds, slots = self._inputs()
        dq[0] = 0  # slot 0 = the zero adapter
        got = delta_matmul(
            jnp.asarray(x), jnp.asarray(dq), jnp.asarray(ds),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.ones(x.shape[0], jnp.float32), interpret=True,
        )
        assert np.abs(np.asarray(got)).max() == 0.0

    def test_lora_grouped_matches_masked_loop(self):
        import jax.numpy as jnp
        from scratchpad_tpu.ops.ldmm import lora_grouped
        from scratchpad_tpu.toppings.manager import MAX_ACTIVE_TOPPINGS

        rng = np.random.default_rng(1)
        T, In, r, Out = 24, 64, 8, 96
        S = MAX_ACTIVE_TOPPINGS
        A = rng.standard_normal((S, In, r), np.float32) * 0.1
        B = rng.standard_normal((S, r, Out), np.float32) * 0.1
        scaling = np.linspace(0.0, 2.0, S).astype(np.float32)
        slots = rng.integers(0, S, T).astype(np.int32)
        x = rng.standard_normal((T, In), np.float32)

        want = np.zeros((T, Out), np.float32)
        for j in range(1, S):
            contrib = (x @ A[j]) @ B[j] * scaling[j]
            want += np.where((slots == j)[:, None], contrib, 0)

        onehot = (slots[:, None] == np.arange(1, S)).astype(np.float32)
        got = lora_grouped(
            jnp.asarray(x), jnp.asarray(A[1:]), jnp.asarray(B[1:]),
            jnp.asarray(onehot * scaling[1:][None, :]),
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
