from .rvq import nearest_codebook, nearest_codebook_reference
from .rvq_fused import rvq_encode_fused, rvq_encode_reference
from .sswm import whiten_correlate, whiten_correlate_reference

__all__ = [
    "nearest_codebook",
    "nearest_codebook_reference",
    "rvq_encode_fused",
    "rvq_encode_reference",
    "whiten_correlate",
    "whiten_correlate_reference",
]
