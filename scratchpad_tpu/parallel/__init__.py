from scratchpad_tpu.parallel.sp import make_sp_extend_attention, sp_prefill

__all__ = ["make_sp_extend_attention", "sp_prefill"]
