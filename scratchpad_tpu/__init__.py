"""scratchpad_tpu: a TPU-native LLM serving engine.

A from-scratch rebuild of the capabilities of eth-easl/Scratchpad (an SRT-style
serving stack, see /root/reference) designed TPU-first:

- single-controller JAX engine per host (no ZMQ process mesh); multi-host =
  the same program on every host over a `jax.sharding.Mesh`
- continuous batching with a radix prefix cache, chunked prefill and
  retraction (reference: scratchpad/scheduler/)
- paged KV cache held in device arrays, token slots grouped into pages for
  DMA-friendly Pallas attention (reference: scratchpad/memory/pool.py)
- fixed-shape jit-compiled prefill/decode steps over a bucket ladder — the
  XLA analogue of the reference's CUDA-graph ladder
  (reference: scratchpad/model_executor/cuda_graph_runner.py)
- tensor parallelism via NamedSharding over the mesh's "tp" axis; XLA inserts
  the collectives (reference: scratchpad/distributed/)
"""

__version__ = "0.1.0"
