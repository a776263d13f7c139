from .config import (
    CodecConfig,
    MelConfig,
    NeuralWMConfig,
    SemanticWMConfig,
    SpreadSpectrumConfig,
    StftConfig,
)
from .padding import pad_to_multiple, pad_axis_to, length_mask
from . import audio_io

__all__ = [
    "CodecConfig",
    "MelConfig",
    "NeuralWMConfig",
    "SemanticWMConfig",
    "SpreadSpectrumConfig",
    "StftConfig",
    "pad_to_multiple",
    "pad_axis_to",
    "length_mask",
    "audio_io",
]
