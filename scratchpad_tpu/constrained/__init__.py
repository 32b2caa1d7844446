from scratchpad_tpu.constrained.backend import GrammarBackend, Grammar

__all__ = ["GrammarBackend", "Grammar"]
