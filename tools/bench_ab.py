"""Same-session A/B sweeps on the real chip (device-epoch variance makes
cross-session comparisons meaningless — PERF_r03.md). Each sweep builds one
engine per config IN ONE PROCESS and prints a JSON line per run.

Usage: python tools/bench_ab.py <suite> [repeats]
Suites:
  northstar3b  bf16 vs W4A16 vs W4A8 on llama-3.2-3b (BASELINE north-star
               ratio: the 8B FP16 side OOMs single-chip, 3B fits both ways)
  depth1b      decode pipeline depth 1 vs 2 vs 3 on bf16 llama-3.2-1b
  w4a8_8b      8B W4A8(+int8 KV) bs32/64 (kernel-tuning target)
  prefill      prefill/extend throughput (see bench_prefill suite entries)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    suite = sys.argv[1] if len(sys.argv) > 1 else "northstar3b"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    import bench

    hbm = 819.0
    common = dict(
        prompt_len=128, decode_len=128, hbm_gbps=hbm, on_tpu=True,
        repeats=repeats, sampled=False, spec=None, n_toppings=0,
    )

    if suite == "northstar3b":
        runs = [
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant=None,
                 kv_dtype="auto", batch_size=64, max_total_tokens=32768),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a16",
                 kv_dtype="auto", batch_size=64, max_total_tokens=32768),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=64, max_total_tokens=32768),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=64, max_total_tokens=32768),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant=None,
                 kv_dtype="auto", batch_size=32, max_total_tokens=32768),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=32, max_total_tokens=32768),
        ]
    elif suite == "depth1b":
        runs = []
        for depth in (1, 2, 3):
            runs.append(
                dict(preset="llama-3.2-1b", dtype="bfloat16", quant=None,
                     kv_dtype="auto", batch_size=64, max_total_tokens=65536,
                     env={"SPTPU_BENCH_PIPELINE": str(depth)})
            )
    elif suite == "w4a8_8b":
        runs = [
            dict(preset="llama-3.1-8b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=32, max_total_tokens=32768),
            dict(preset="llama-3.1-8b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=64, max_total_tokens=32768),
        ]
    elif suite == "r4round2":
        # one session: pipeline-depth A/B on the recorded bf16 1B config,
        # then the quantized configs with the fused gate|up kernel; the 3B
        # pair re-anchors the north-star ratio with the fusion in
        runs = [
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant=None,
                 kv_dtype="auto", batch_size=64, max_total_tokens=32768),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=64, max_total_tokens=32768),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant=None,
                 kv_dtype="auto", batch_size=64, max_total_tokens=65536,
                 env={"SPTPU_BENCH_PIPELINE": "1"}),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant=None,
                 kv_dtype="auto", batch_size=64, max_total_tokens=65536,
                 env={"SPTPU_BENCH_PIPELINE": "2"}),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant=None,
                 kv_dtype="auto", batch_size=64, max_total_tokens=65536,
                 env={"SPTPU_BENCH_PIPELINE": "3"}),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=64, max_total_tokens=65536),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=64, max_total_tokens=65536),
            dict(preset="llama-3.1-8b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=32, max_total_tokens=32768),
            # 4-bit-native storage (one Mosaic s4 cast replaces the u8
            # unpack chain) — the r4 kernel experiment
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=64, max_total_tokens=65536,
                 env={"SPTPU_W4_4BIT": "1"}),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=64, max_total_tokens=32768,
                 env={"SPTPU_W4_4BIT": "1"}),
            dict(preset="llama-3.1-8b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=32, max_total_tokens=32768,
                 env={"SPTPU_W4_4BIT": "1"}),
        ]
    elif suite == "qlm":
        # all levers in: depth-2 pipeline + fused gate|up + auto 4-bit LM
        # head + bf16 KV scale pool
        runs = [
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant=None,
                 kv_dtype="auto", batch_size=64, max_total_tokens=32768),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=64, max_total_tokens=32768),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=32, max_total_tokens=32768),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=64, max_total_tokens=65536),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=64, max_total_tokens=65536),
            dict(preset="llama-3.1-8b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=32, max_total_tokens=32768),
        ]
    elif suite == "ns32":
        # the headline north-star pair, same session back-to-back
        runs = [
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant=None,
                 kv_dtype="auto", batch_size=32, max_total_tokens=32768),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=32, max_total_tokens=32768),
        ]
    elif suite == "cpab":
        # did the CP=32 default hurt the W4A8 configs? same-session A/B
        runs = [
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=32, max_total_tokens=32768,
                 env={"SPTPU_GQA_CP": "16"}),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=32, max_total_tokens=32768,
                 env={"SPTPU_GQA_CP": "32"}),
        ]
    elif suite == "r5kernel":
        # round-5 kernel levers, same session: grouped decode kernel (v3)
        # on/off, inline-scale int8 KV vs separate pool, 4-bit-native W4
        # via the u8-boundary bitcast — all on the 1B headline config,
        # with a bf16 anchor pair
        runs = [
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant=None,
                 kv_dtype="auto", batch_size=64, max_total_tokens=65536,
                 env={"SPTPU_GQA_GROUP": "0"}),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant=None,
                 kv_dtype="auto", batch_size=64, max_total_tokens=65536),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=64, max_total_tokens=65536,
                 env={"SPTPU_GQA_GROUP": "0"}),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=64, max_total_tokens=65536),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=64, max_total_tokens=65536),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=64, max_total_tokens=65536,
                 env={"SPTPU_KV_INLINE": "1"}),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=64, max_total_tokens=65536,
                 env={"SPTPU_W4_4BIT": "1"}),
            dict(preset="llama-3.2-1b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=64, max_total_tokens=65536,
                 env={"SPTPU_W4A8_EXTEND": "a16"}),
        ]
    elif suite == "r5big":
        # round-5 levers at 3B/8B: north-star re-anchor with the grouped
        # kernel, inline int8 KV, and the 4-bit boundary at 8B
        runs = [
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant=None,
                 kv_dtype="auto", batch_size=32, max_total_tokens=32768),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="auto", batch_size=32, max_total_tokens=32768),
            dict(preset="llama-3.2-3b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=64, max_total_tokens=32768,
                 env={"SPTPU_KV_INLINE": "1"}),
            # inline KV + 4-bit W4 are default-on since r5; A/B the 4-bit
            # default at the 8B flagship by forcing it OFF first
            dict(preset="llama-3.1-8b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=32, max_total_tokens=32768,
                 env={"SPTPU_W4_4BIT": "0"}),
            dict(preset="llama-3.1-8b", dtype="bfloat16", quant="w4a8",
                 kv_dtype="int8", batch_size=32, max_total_tokens=32768),
        ]
    elif suite == "vlm":
        # on-chip multimodal measurement (VERDICT r3 item 8): vision-tower
        # encode latency + image-prompt prefill + decode on Qwen2-VL-2B
        # geometry (random weights)
        import time

        import numpy as np

        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.config.model_config import get_preset
        from scratchpad_tpu.sampling.sampling_params import SamplingParams
        from scratchpad_tpu.server.engine import Engine

        cfg = get_preset("qwen2-vl-2b", dtype="bfloat16")
        eng = Engine(
            ServerArgs(
                preset="qwen2-vl-2b",
                random_weights=True,
                dtype="bfloat16",
                max_total_tokens=16384,
                max_running_requests=8,
                warmup_capture=False,
            ),
            model_config=cfg,
        )
        rng_np = np.random.default_rng(0)
        size = eng.scheduler.runner.model.vision.image_size
        px = rng_np.standard_normal((1, 3, size, size)).astype(np.float32) * 0.5
        # vision tower alone (jitted encode path)
        eng.scheduler.runner.encode_images(px)  # compile
        t0 = time.perf_counter()
        for _ in range(repeats):
            feats = eng.scheduler.runner.encode_images(px)
        enc_ms = (time.perf_counter() - t0) / repeats * 1e3
        img_tok = cfg.multimodal["image_token_id"]
        vstart = cfg.multimodal["vision_start_token_id"]
        prompt = [3, vstart, img_tok, 11, 13, 17, 19, 23]
        dec = int(os.environ.get("SPTPU_VLM_DECODE", "64"))
        sp = SamplingParams(
            temperature=0.0, max_new_tokens=dec, ignore_eos=True
        )
        eng.generate(input_ids=prompt, sampling_params=sp, image_data=px)
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = eng.generate(
                input_ids=prompt, sampling_params=sp, image_data=px
            )
            samples.append(dec / (time.perf_counter() - t0))
        print(json.dumps({
            "metric": "vlm_qwen2vl2b_encode_ms", "value": round(enc_ms, 1),
            "unit": "ms", "patches": int(feats.shape[0] * feats.shape[1]),
        }), flush=True)
        print(json.dumps({
            "metric": "vlm_qwen2vl2b_e2e_decode_tok_s",
            "value": round(float(np.median(samples)), 1),
            "unit": "tok/s", "prompt_tokens": out.prompt_tokens,
        }), flush=True)
        return
    else:
        raise SystemExit(f"unknown suite {suite!r}")

    for run in runs:
        env = run.pop("env", {})
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            res = bench.run_config(jax, **common, **run)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        res.update({k: v for k, v in env.items()})
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
