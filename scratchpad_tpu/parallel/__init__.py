from scratchpad_tpu.parallel.sp import make_sp_extend_attention, sp_prefill


def mesh_from_args(args):
    """Build the serving mesh from ServerArgs sizes (dp/pp/sp/tp).

    The reference spawns one scheduler process per TP rank
    (reference: server/server.py:246-266); here parallelism is one
    jax.sharding.Mesh driven by a single controller. Axes are ordered
    outer→inner (dp, pp, sp, tp) so tp rides the innermost (ICI-adjacent)
    devices. Returns None when every size is 1 (single-device serving).
    """
    sizes = [
        ("dp", args.dp_size),
        ("pp", args.pp_size),
        ("sp", args.sp_size),
        ("tp", args.tp_size),
    ]
    sizes = [(n, s) for n, s in sizes if s > 1]
    if not sizes:
        return None

    import jax
    import numpy as np
    from jax.sharding import Mesh

    need = int(np.prod([s for _, s in sizes]))
    devs = jax.devices()
    if len(devs) < need:
        raise ValueError(
            f"mesh {dict(sizes)} needs {need} devices; have {len(devs)}"
        )
    arr = np.array(devs[:need]).reshape([s for _, s in sizes])
    return Mesh(arr, tuple(n for n, _ in sizes))


__all__ = ["make_sp_extend_attention", "sp_prefill", "mesh_from_args"]
