from .rvq import nearest_codebook, nearest_codebook_reference
from .sswm import whiten_correlate, whiten_correlate_reference

__all__ = [
    "nearest_codebook",
    "nearest_codebook_reference",
    "whiten_correlate",
    "whiten_correlate_reference",
]
