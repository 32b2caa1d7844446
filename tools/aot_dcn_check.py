"""Validate the simulator's per-step DCN collective-byte model against real
sharded TPU HLO — no TPU needed (jax.experimental.topologies, 2 slices).

tools/simulator/analyzer.py::scaling_projection charges, per decode tick:

- tp-across-hosts: 2 all-reduces of [bs, H] bf16 per layer
- pp-across-hosts: 1 collective-permute of [bs, H] bf16 at the boundary

This tool AOT-compiles exactly those program shapes for Llama-70B dims on a
2-slice v5e topology and extracts the collective ops + payload bytes from
the compiled HLO, asserting the analytic counts match what XLA emits.

Run: python tools/aot_dcn_check.py   (exit 0 = model matches HLO)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BS, H, INTER = 64, 8192, 28672  # Llama-3.1-70B decode shapes
LAYERS = 4  # compile a few layers; the per-layer count is what we check


def get_devices():
    topo = topologies.get_topology_desc(
        platform="tpu",
        topology_name="v5e:2x4",
        chips_per_host_bounds=(2, 4, 1),
        num_slices=2,
    )
    return topo.devices


def tp_program(mesh):
    """L layers of the real megatron pattern — column-parallel in,
    row-parallel out, ONE psum after attention-out and one after mlp-down
    = 2 all-reduces of [BS, H] per layer."""

    def layer(x, wq, wo, wu, wd):
        a = (x @ wq) @ wo  # [BS, H/tp] @ [H/tp, H] -> partial [BS, H]
        x = jax.lax.psum(a, "tp")
        m = (x @ wu) @ wd  # [BS, INTER/tp] @ [INTER/tp, H]
        return jax.lax.psum(m, "tp")

    from jax import shard_map

    def fwd(x, wq, wo, wu, wd):
        def body(x, wq, wo, wu, wd):
            for i in range(LAYERS):
                x = layer(x, wq[i], wo[i], wu[i], wd[i])
            return x

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P(),
                P(None, None, "tp"),
                P(None, "tp", None),
                P(None, None, "tp"),
                P(None, "tp", None),
            ),
            out_specs=P(),
            check_vma=False,
        )(x, wq, wo, wu, wd)

    shapes = (
        jax.ShapeDtypeStruct((BS, H), jnp.bfloat16),
        jax.ShapeDtypeStruct((LAYERS, H, H), jnp.bfloat16),
        jax.ShapeDtypeStruct((LAYERS, H, H), jnp.bfloat16),
        jax.ShapeDtypeStruct((LAYERS, H, INTER), jnp.bfloat16),
        jax.ShapeDtypeStruct((LAYERS, INTER, H), jnp.bfloat16),
    )
    shardings = (
        NamedSharding(mesh, P()),
        NamedSharding(mesh, P(None, None, "tp")),
        NamedSharding(mesh, P(None, "tp", None)),
        NamedSharding(mesh, P(None, None, "tp")),
        NamedSharding(mesh, P(None, "tp", None)),
    )
    return jax.jit(fwd, in_shardings=shardings).lower(*shapes)


def pp_program(mesh):
    """One boundary activation hop between pp stages; activations stay
    tp-sharded inside the stage (parallel/pp.py composes pp with GSPMD
    tp), so each chip's DCN leg carries [BS, H/tp_in]."""
    from jax import shard_map

    def fwd(x):
        def body(x):
            return jax.lax.ppermute(
                x, "pp", perm=[(0, 1)]
            )

        return shard_map(
            body,
            mesh=mesh,
            in_specs=P(None, "tp"),
            out_specs=P(None, "tp"),
            check_vma=False,
        )(x)

    shapes = (jax.ShapeDtypeStruct((BS, H), jnp.bfloat16),)
    return jax.jit(
        fwd, in_shardings=(NamedSharding(mesh, P(None, "tp")),)
    ).lower(*shapes)


def dcn_send_bytes(txt: str):
    """(count, per-chip payload bytes) of the DCN legs in multislice HLO.

    XLA:TPU lowers cross-slice collectives to host-transfer send/recv
    pairs (`is_host_transfer=true`) riding DCN; intra-slice portions stay
    reduce-scatter/all-gather on ICI. Summing the sends' payloads gives
    exactly the per-chip bytes the simulator's DCN model must predict."""
    total = 0
    count = 0
    for m in re.finditer(r"\bsend\(", txt):
        line = txt[txt.rfind("\n", 0, m.start()) + 1 : txt.find("\n", m.start())]
        if "is_host_transfer=true" not in line:
            continue
        shapes = re.findall(r"(bf16|f32|s32|u32)\[([\d,]+)\]", line)
        if not shapes:
            continue
        dt, dims = shapes[0]
        n = int(np.prod([int(d) for d in dims.split(",")]))
        total += n * (2 if dt == "bf16" else 4)
        count += 1
    return count, total


def main():
    devs = get_devices()
    ok = True

    tp_in = 8  # chips per host/slice

    # tp layout: 16-wide tp spanning both slices — every psum's bisection
    # traffic crosses DCN
    mesh_tp = Mesh(np.array(devs).reshape(1, 16), ("dp", "tp"))
    txt = tp_program(mesh_tp).compile().as_text()
    n_s, bytes_s = dcn_send_bytes(txt)
    # per chip: one DCN send per psum carrying its reduce-scattered shard
    # [BS, H/tp_in]; host total = tp_in x that = BS*H*2 per all-reduce
    want_n = 2 * LAYERS
    want_per_chip = want_n * BS * (H // tp_in) * 2
    host_bytes = bytes_s * tp_in
    print(
        f"tp: {n_s} DCN sends, {bytes_s} B/chip -> {host_bytes} B/host-step "
        f"(model: {want_n} all-reduces x BS*H*2 = {want_n * BS * H * 2} B)"
    )
    if n_s != want_n or not (
        want_per_chip / 2 <= bytes_s <= want_per_chip * 2
    ):
        print("  MISMATCH vs analytic model")
        ok = False

    # pp layout: stage boundary permute, activations tp-sharded in-stage
    mesh_pp = Mesh(np.array(devs).reshape(2, 8), ("pp", "tp"))
    txt = pp_program(mesh_pp).compile().as_text()
    n_cp, bytes_cp = dcn_send_bytes(txt)
    want_cp_chip = BS * (H // tp_in) * 2
    print(
        f"pp: {n_cp} DCN sends, {bytes_cp} B/chip -> {bytes_cp * tp_in} "
        f"B/host-step (model: 1 x BS*H*2 = {BS * H * 2} B)"
    )
    if not (want_cp_chip / 2 <= bytes_cp <= want_cp_chip * 2):
        print("  MISMATCH vs analytic model")
        ok = False

    print("DCN byte model", "MATCHES HLO" if ok else "DOES NOT MATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
