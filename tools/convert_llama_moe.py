"""Stack per-expert Llama-MoE checkpoint tensors into expert-stacked form.

Counterpart of the reference converter
(reference: scratchpad/utils/weight_converters/convert_llama_moe.py):
checkpoints that store each expert's MLP as `...moe.mlp.<idx>.<rest>` are
rewritten to one stacked tensor per key (`...moe.mlp.<rest>` of shape
[num_experts, ...]) — the layout the fused MoE expert stacks consume
directly (scratchpad_tpu/models/mixtral.py / qwen_moe.py weight loading).

Runs on numpy safetensors (no torch/GPU needed):

    python tools/convert_llama_moe.py --input-path in.safetensors \
        --save-path out.safetensors
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert_weights(tensors: dict) -> dict:
    """Pure transform: {key: np.ndarray} -> {key: np.ndarray} with
    `moe.mlp.<idx>.` segments folded into a stacked leading axis; non-MoE
    keys pass through unchanged."""
    stacked: dict[str, dict[int, np.ndarray]] = {}
    out: dict[str, np.ndarray] = {}
    for key, val in tensors.items():
        if "moe.mlp" not in key:
            out[key] = val
            continue
        parts = key.split(".")
        i = parts.index("mlp") + 1
        new_key = ".".join(parts[:i] + parts[i + 1 :])
        stacked.setdefault(new_key, {})[int(parts[i])] = val
    for key, by_idx in stacked.items():
        n = max(by_idx) + 1
        missing = [i for i in range(n) if i not in by_idx]
        if missing:
            raise ValueError(f"{key}: missing expert indices {missing}")
        out[key] = np.stack([by_idx[i] for i in range(n)])
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input-path", type=str, required=True)
    parser.add_argument("--save-path", type=str, required=True)
    args = parser.parse_args()

    from safetensors.numpy import load_file, save_file

    out = convert_weights(load_file(args.input_path))
    save_file(out, args.save_path)
    n_stacked = sum(1 for k in out if "moe.mlp" in k)
    print(f"wrote {len(out)} tensors ({n_stacked} expert-stacked) to "
          f"{args.save_path}")


if __name__ == "__main__":
    main()
