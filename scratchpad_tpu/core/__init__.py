from scratchpad_tpu.core.req import Req, FinishReason
from scratchpad_tpu.core.scheduler import Scheduler

__all__ = ["Req", "FinishReason", "Scheduler"]
