from .indextts import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
