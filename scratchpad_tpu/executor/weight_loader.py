"""Checkpoint loading from local HF-format directories.

Analogue of the reference's vLLM-derived model loader
(reference: scratchpad/model_executor/model_loader.py:94-466): reads
``*.safetensors`` (with or without an index file), hands the flat state dict
to the model's converter, and places the resulting pytree on device with the
model's TP shardings. No network access.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from scratchpad_tpu.utils import get_logger

logger = get_logger("weight_loader")


def load_hf_state(model_path: str) -> dict[str, Any]:
    """Load a flat HF state dict (name -> array) from safetensors files."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {model_path}")
    index_path = os.path.join(model_path, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(
            {os.path.join(model_path, v) for v in index["weight_map"].values()}
        )
    state: dict[str, Any] = {}
    for fp in files:
        # framework="flax" handles bf16 (numpy does not)
        with safe_open(fp, framework="flax") as f:
            for name in f.keys():
                state[name] = np.asarray(f.get_tensor(name))
    logger.info("loaded %d tensors from %d files", len(state), len(files))
    return state


def place_params(
    params: Any, specs: Any, mesh: Optional[Mesh]
) -> Any:
    """Device-put a param pytree with NamedShardings (or single-device)."""
    if mesh is None:
        return jax.tree.map(jax.device_put, params)

    axes = set(mesh.axis_names)

    def clean(spec):
        """Drop spec axes the mesh doesn't have (e.g. "tp" specs on an
        sp-only mesh) — those dims are simply replicated."""
        if spec is None:
            return None
        parts = []
        for p in spec:
            if p is None:
                parts.append(None)
            elif isinstance(p, tuple):
                kept = tuple(r for r in p if r in axes)
                parts.append(kept if kept else None)
            else:
                parts.append(p if p in axes else None)
        return PartitionSpec(*parts)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, clean(spec)))

    return jax.tree.map(put, params, specs)
