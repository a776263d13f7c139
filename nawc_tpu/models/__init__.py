from .base import Watermarker, random_message, bit_accuracy, available, build, register
from .spread_spectrum import SpreadSpectrumWM

__all__ = [
    "Watermarker", "random_message", "bit_accuracy", "available", "build",
    "register", "SpreadSpectrumWM",
]
