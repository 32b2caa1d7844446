from scratchpad_tpu.ops.attention.xla_backend import (
    write_kv,
    decode_attention_xla,
    extend_attention_xla,
)

__all__ = ["write_kv", "decode_attention_xla", "extend_attention_xla"]
