from scratchpad_tpu.ops.quant.w4a16 import (
    quantize_w4,
    quantize_stacked,
    quantize_model_params,
    slice_layer,
    dequantize_w4,
    w4a16_matmul_xla,
    w4a8_matmul_xla,
    QuantizedLinear,
    QUANT_TARGETS,
)

__all__ = [
    "quantize_w4",
    "quantize_stacked",
    "quantize_model_params",
    "slice_layer",
    "dequantize_w4",
    "w4a16_matmul_xla",
    "w4a8_matmul_xla",
    "QuantizedLinear",
    "QUANT_TARGETS",
]
