from .base import Watermarker, random_message, bit_accuracy, available, build, register
from .spread_spectrum import SpreadSpectrumWM
from .semantic import SemanticWM, pca_axis, kmeans_axis, random_axis
from .chunked import ChunkedWM
from .psychoacoustic import PsychoacousticWM, ints_to_bits, bits_to_ints
from .neural import NeuralWM, init_neural_wm, WMGenerator, WMDetector
from .token_green import TokenGreenWM, green_mask
from .resampled import ResampledWM, at_rate

__all__ = [
    "Watermarker", "random_message", "bit_accuracy", "available", "build",
    "register", "SpreadSpectrumWM", "SemanticWM", "ChunkedWM",
    "PsychoacousticWM", "ints_to_bits", "bits_to_ints",
    "NeuralWM", "init_neural_wm", "WMGenerator", "WMDetector",
    "TokenGreenWM", "green_mask",
    "pca_axis", "kmeans_axis", "random_axis",
]
