from scratchpad_tpu.toppings.manager import ToppingsManager, MAX_ACTIVE_TOPPINGS

__all__ = ["ToppingsManager", "MAX_ACTIVE_TOPPINGS"]
