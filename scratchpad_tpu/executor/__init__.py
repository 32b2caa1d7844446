from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode

__all__ = ["ForwardMeta", "ForwardMode"]
