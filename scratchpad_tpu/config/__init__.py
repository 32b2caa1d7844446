from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.config.server_args import ServerArgs

__all__ = ["ModelConfig", "ServerArgs"]
