from .base import Watermarker, random_message, bit_accuracy, available, build, register
from .spread_spectrum import SpreadSpectrumWM
from .semantic import SemanticWM, pca_axis, kmeans_axis, random_axis

__all__ = [
    "Watermarker", "random_message", "bit_accuracy", "available", "build",
    "register", "SpreadSpectrumWM", "SemanticWM",
    "pca_axis", "kmeans_axis", "random_axis",
]
