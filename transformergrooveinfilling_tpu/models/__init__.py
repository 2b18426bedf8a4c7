"""Model family: groove transformer encoder / encoder-decoder with h/v/o heads."""

from .transformer import (
    GrooveTransformerConfig,
    GrooveTransformerEncoder,
    GrooveTransformer,
    sinusoidal_positional_encoding,
    build_model,
    predict,
)
from .losses import calculate_loss, LossOutputs
from . import torch_compat

__all__ = [
    "GrooveTransformerConfig",
    "GrooveTransformerEncoder",
    "GrooveTransformer",
    "sinusoidal_positional_encoding",
    "build_model",
    "predict",
    "calculate_loss",
    "LossOutputs",
    "torch_compat",
]
