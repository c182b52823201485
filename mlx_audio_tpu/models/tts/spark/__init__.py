from .bicodec import BiCodec
from .spark import Model, ModelConfig

__all__ = ["BiCodec", "Model", "ModelConfig"]
