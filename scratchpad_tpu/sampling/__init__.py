from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.sampling.batch_info import SamplingBatchInfo

__all__ = ["SamplingParams", "SamplingBatchInfo"]
