from .base import Watermarker, random_message, bit_accuracy, available, build, register
from .spread_spectrum import SpreadSpectrumWM
from .semantic import SemanticWM, pca_axis, kmeans_axis, random_axis
from .chunked import ChunkedWM
from .psychoacoustic import PsychoacousticWM, ints_to_bits, bits_to_ints

__all__ = [
    "Watermarker", "random_message", "bit_accuracy", "available", "build",
    "register", "SpreadSpectrumWM", "SemanticWM", "ChunkedWM",
    "PsychoacousticWM", "ints_to_bits", "bits_to_ints",
    "pca_axis", "kmeans_axis", "random_axis",
]
