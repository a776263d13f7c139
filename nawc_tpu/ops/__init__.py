from .rvq import nearest_codebook, nearest_codebook_reference

__all__ = ["nearest_codebook", "nearest_codebook_reference"]
