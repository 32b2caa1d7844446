"""Serving benchmark: decode throughput on one TPU chip.

Prints one JSON line PER CONFIG (the driver parses the LAST line as the
headline): {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` is the fraction of the HBM-bandwidth speed-of-light for the
decode step (params + live KV read once per step) — the roofline the
reference's simulator uses for GPUs
(reference: tools/simulator/internal/configs/hardware_params.py).

Device-epoch variance dominates cross-session A/Bs (PERF_r03.md): identical
code measured 9.06-9.74k tok/s hours apart while in-session repeats agree to
0.1%. So each config is measured ``SPTPU_BENCH_REPEATS`` times in-session and
reported as the median, with min/max recorded for spread.

Default (no env): a suite of bf16 -> w4a8 -> w4a8+int8KV on one engine
build each, so the driver record reflects the quantized serving configs,
not just the slowest bf16 one. Any variant env below switches to a single
explicit config.

Variants (env):
  SPTPU_BENCH_PRESET  model preset (default llama-3.2-1b; north-star =
                      llama-3.1-8b per BASELINE.json config 3)
  SPTPU_BENCH_QUANT   w4a16 | w4a8 | fp8 (weight quantization)
  SPTPU_BENCH_KV      int8 | fp8 (KV-cache quantization)
  SPTPU_BENCH_BS      batch size (default 64 for 1B, 32 for 8B)
  SPTPU_BENCH_REPEATS in-session measurement repeats (default 3)
  SPTPU_BENCH_SUITE   comma list for the default suite, entries
                      "<quant?>+<kv?>" e.g. "bf16,w4a8,w4a8+int8"
  SPTPU_BENCH_SAMPLED temperature=0.8/top_p=0.9/top_k=64 instead of greedy
  SPTPU_BENCH_SPEC    ngram | draft | eagle: speculative decoding over a
                      repetitive prompt set (drafts actually hit)
  SPTPU_BENCH_PIPELINE decode pipeline depth (default auto=2 on TPU)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import numpy as np


def build_sched(preset, dtype, quant, kv_dtype, batch_size, max_total_tokens,
                prompt_len, on_tpu, spec, n_toppings, rng):
    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.config.model_config import get_preset
    from scratchpad_tpu.core.scheduler import Scheduler

    cfg = get_preset(preset, dtype=dtype)
    args = ServerArgs(
        preset=preset,
        random_weights=True,
        dtype=dtype,
        quantization=quant,
        kv_cache_dtype=kv_dtype,
        kv_layout=os.environ.get("SPTPU_BENCH_KV_LAYOUT", "auto"),
        attention_backend=os.environ.get("SPTPU_ATTN", "auto"),
        page_size=int(os.environ.get("SPTPU_PS", "16")),
        max_total_tokens=max_total_tokens,
        max_running_requests=batch_size,
        # the ragged kernel serves batched chunked prefill directly
        max_prefill_tokens=4096 if on_tpu else prompt_len,
        chunked_prefill_size=2048 if on_tpu else prompt_len,
        decode_window_size=int(os.environ.get("SPTPU_BENCH_WINDOW", "64")),
        # unset -> None (auto: the decode-window pipeline on a single
        # TPU chip); "0" forces off, anything else on
        enable_overlap=(
            None
            if "SPTPU_BENCH_OVERLAP" not in os.environ
            else os.environ["SPTPU_BENCH_OVERLAP"] not in ("", "0")
        ),
        decode_pipeline_depth=(
            int(os.environ["SPTPU_BENCH_PIPELINE"])
            if "SPTPU_BENCH_PIPELINE" in os.environ
            else None
        ),
        speculative_algorithm=spec,
        speculative_draft_preset=preset if spec == "draft" else None,
        # the warmup serve below compiles every bucket this run will hit;
        # the startup ladder capture would double the (relay-expensive)
        # compile/exec work per run
        warmup_capture=False,
        # unset -> None (auto: 4-bit head for W4-quantized engines);
        # "0" forces off, anything else forces on
        quantize_lm_head=(
            None
            if "SPTPU_BENCH_QLM" not in os.environ
            else os.environ["SPTPU_BENCH_QLM"] not in ("", "0")
        ),
    )
    sched = Scheduler(cfg, args)

    # multi-adapter serving overhead: register N random rank-16 LoRA
    # adapters and spread requests round-robin
    if n_toppings:
        from scratchpad_tpu.toppings import ToppingsManager

        r = 16
        tm = ToppingsManager(cfg, max_rank=r)
        for a in range(n_toppings):
            state = {}
            for l in range(cfg.num_hidden_layers):
                for proj, din in (
                    ("q_proj", cfg.hidden_size),
                    ("v_proj", cfg.hidden_size),
                ):
                    pre = f"base_model.model.layers.{l}.self_attn.{proj}"
                    state[f"{pre}.lora_A.weight"] = (
                        rng.standard_normal((r, din)).astype(np.float32) * 0.01
                    )
                    dout = (
                        cfg.num_attention_heads * cfg.head_dim
                        if proj == "q_proj"
                        else cfg.num_kv_heads * cfg.head_dim
                    )
                    state[f"{pre}.lora_B.weight"] = (
                        rng.standard_normal((dout, r)).astype(np.float32) * 0.01
                    )
            tm.register_state(f"adapter{a}", state, scaling=1.0)
        sched.runner.attach_toppings(tm)
    return sched, cfg


def run_config(jax, *, preset, dtype, quant, kv_dtype, batch_size, prompt_len,
               decode_len, max_total_tokens, hbm_gbps, on_tpu, repeats,
               sampled, spec, n_toppings):
    from scratchpad_tpu.core.req import Req
    from scratchpad_tpu.sampling.sampling_params import SamplingParams

    rng = np.random.default_rng(0)
    sched, cfg = build_sched(
        preset, dtype, quant, kv_dtype, batch_size, max_total_tokens,
        prompt_len, on_tpu, spec, n_toppings, rng,
    )

    if sampled:
        sp_kw = dict(temperature=0.8, top_p=0.9, top_k=64)
    else:
        sp_kw = dict(temperature=0.0)

    hi = min(32000, cfg.vocab_size)  # stay in-vocab for tiny presets

    def bench_prompt():
        if spec:
            # periodic prompts: greedy decode of a random model on a cycle
            # almost always cycles too, so ngram/draft proposals hit
            base = rng.integers(1, hi, 8).tolist()
            return (base * (prompt_len // 8 + 1))[:prompt_len]
        return rng.integers(1, hi, prompt_len).tolist()

    def submit(tag):
        for i in range(batch_size):
            sched.add_request(
                Req(
                    rid=f"{tag}-r{i}",
                    origin_input_ids=bench_prompt(),
                    sampling_params=SamplingParams(
                        max_new_tokens=decode_len, ignore_eos=True, **sp_kw
                    ),
                    topping_idx=(1 + i % n_toppings) if n_toppings else 0,
                )
            )

    # warmup: compiles prefill + decode buckets
    submit("warm")
    while sched.has_work():
        sched.step()

    prof_dir = os.environ.get("SPTPU_BENCH_PROFILE")
    samples = []
    prefill_samples = []
    # SPTPU_BENCH_PROF=prefill traces the PREFILL loop of the last repeat
    # instead of decode (VERDICT r4 item 6: where does the 1B quantized
    # extend MFU go)
    prof_prefill = os.environ.get("SPTPU_BENCH_PROF", "decode") == "prefill"
    for rep in range(repeats):
        submit(f"m{rep}")
        # drive all prefills first, timed separately (first recorded
        # extend-path numbers — VERDICT r3 item 5; the reference measures
        # TTFT with tools/benchmark/bench_perf.py:21-120)
        if prof_dir and prof_prefill and rep == repeats - 1:
            jax.profiler.start_trace(prof_dir)
        tp0 = time.perf_counter()
        while sched.num_queued() > 0 or sched.chunked_req is not None:
            sched.step()
        if prof_dir and prof_prefill and rep == repeats - 1:
            jax.profiler.stop_trace()
        prefill_samples.append(
            batch_size * prompt_len / (time.perf_counter() - tp0)
        )
        if prof_dir and not prof_prefill and rep == repeats - 1:
            jax.profiler.start_trace(prof_dir)
        decode_tokens = 0
        t0 = time.perf_counter()
        while sched.has_work():
            events = sched.step()
            decode_tokens += sum(len(ev.new_tokens) for ev in events)
        dt = time.perf_counter() - t0
        if prof_dir and not prof_prefill and rep == repeats - 1:
            jax.profiler.stop_trace()
        samples.append(decode_tokens / dt)

    tok_s = float(np.median(samples))
    prefill_tok_s = float(np.median(prefill_samples))
    # prefill is MXU-bound: model FLOPs/token ~= 2 * matmul params; the
    # bf16 MXU peak on v5e is ~197 TFLOP/s (jax-ml.github.io/scaling-book)
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    Dq = cfg.num_attention_heads * cfg.head_dim
    Dkv = cfg.num_kv_heads * cfg.head_dim
    matmul_params = L * (H * Dq + 2 * H * Dkv + Dq * H + 3 * H * I)
    matmul_params += cfg.vocab_size * H  # lm head read every chunk
    peak_flops = 197e12 if on_tpu else 1e12
    prefill_mfu = prefill_tok_s * 2 * matmul_params / peak_flops

    # speed-of-light decode step: read all params + each request's live KV
    param_bytes = sched.runner.param_bytes
    avg_ctx = prompt_len + decode_len / 2
    kv_bytes = batch_size * avg_ctx * sched.runner.kv_bytes_per_token()
    sol_step = (param_bytes + kv_bytes) / (hbm_gbps * 1e9)
    sol_tok_s = batch_size / sol_step

    tag = f"decode_tok_s_{preset}_bs{batch_size}"
    if quant:
        tag += f"_{quant}"
    if kv_dtype not in ("auto", None):
        tag += f"_kv{kv_dtype}"
    if sampled:
        tag += "_sampled"
    if n_toppings:
        tag += f"_lora{n_toppings}"
    if spec:
        tag += f"_spec-{spec}"
        acc = sched.num_spec_accepted / max(sched.num_spec_steps, 1)
        print(  # diagnostics on stderr: stdout stays JSON-lines only
            f"spec_steps={sched.num_spec_steps} "
            f"accepted_per_step={acc:.3f}",
            file=sys.stderr,
        )
    result = {
        "metric": tag,
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / sol_tok_s, 4),
        "repeats": repeats,
        "min": round(min(samples), 1),
        "max": round(max(samples), 1),
        "prefill_tok_s": round(prefill_tok_s, 1),
        "prefill_mfu": round(prefill_mfu, 4),
    }
    # release device memory before the next engine build
    del sched
    gc.collect()
    return result


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    on_tpu = jax.default_backend() not in ("cpu",)
    quant = os.environ.get("SPTPU_BENCH_QUANT")  # e.g. "w4a16"
    kv_dtype = os.environ.get("SPTPU_BENCH_KV", "auto")  # e.g. "int8"
    sampled = os.environ.get("SPTPU_BENCH_SAMPLED", "") not in ("", "0")
    spec = os.environ.get("SPTPU_BENCH_SPEC") or None  # ngram|draft|eagle
    n_toppings = int(os.environ.get("SPTPU_BENCH_TOPPINGS", "0"))
    repeats = int(os.environ.get("SPTPU_BENCH_REPEATS", "3"))
    if on_tpu:
        preset = os.environ.get("SPTPU_BENCH_PRESET", "llama-3.2-1b")
        dtype = "bfloat16"
        default_bs = 32 if "8b" in preset or "70b" in preset else 64
        batch_size = int(os.environ.get("SPTPU_BENCH_BS", str(default_bs)))
        prompt_len, decode_len = 128, 128
        hbm_gbps = 819.0  # v5e
        # 3B bf16 params (~6.4 GiB) need KV headroom on a 16 GiB chip
        default_tokens = (
            65536 if (default_bs == 64 and "3b" not in preset) else 32768
        )
        max_total_tokens = int(
            os.environ.get("SPTPU_BENCH_TOKENS", str(default_tokens))
        )
    else:
        preset, dtype = "tiny-debug", "float32"
        batch_size, prompt_len, decode_len = 8, 32, 16
        hbm_gbps = 50.0
        max_total_tokens = 8192
        repeats = int(os.environ.get("SPTPU_BENCH_REPEATS", "1"))

    common = dict(
        preset=preset, dtype=dtype, batch_size=batch_size,
        prompt_len=prompt_len, decode_len=decode_len,
        max_total_tokens=max_total_tokens, hbm_gbps=hbm_gbps,
        on_tpu=on_tpu, repeats=repeats, sampled=sampled, spec=spec,
        n_toppings=n_toppings,
    )

    explicit = (
        quant is not None
        or kv_dtype != "auto"
        or sampled
        or spec
        or n_toppings
        or "SPTPU_BENCH_PRESET" in os.environ
        or not on_tpu
    )
    if explicit:
        # single explicit config (variant envs / CPU fallback)
        res = run_config(jax, quant=quant, kv_dtype=kv_dtype, **common)
        print(json.dumps(res))
        return

    # default suite: bf16 then the quantized serving configs; the LAST
    # line is the headline the driver records. Plain W4A8 runs last: at 1B
    # the quantized-KV kernel's per-chunk scale work costs more than the
    # byte savings (r4 session B: 16.8k vs 15.4k with int8 KV), so w4a8 is
    # the fastest 1B production config (VERDICT r3 item 3)
    suite = os.environ.get("SPTPU_BENCH_SUITE", "bf16,w4a8+int8,w4a8")
    last = None
    for entry in suite.split(","):
        entry = entry.strip()
        q, _, kv = entry.partition("+")
        q = None if q in ("", "bf16", "none") else q
        try:
            res = run_config(
                jax, quant=q, kv_dtype=(kv or "auto"), **common
            )
        except Exception as e:  # noqa: BLE001 — one config must not
            # erase the whole driver record; report and continue
            print(f"config {entry!r} failed: {e}", file=sys.stderr)
            continue
        last = res
        print(json.dumps(res), flush=True)
    if last is None:
        raise SystemExit("every bench config failed")


if __name__ == "__main__":
    main()
