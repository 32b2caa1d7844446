from scratchpad_tpu.tokenizer.detokenizer import IncrementalDetokenizer

__all__ = ["IncrementalDetokenizer"]
