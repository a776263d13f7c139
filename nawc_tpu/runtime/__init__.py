from .pipeline import WatermarkService

__all__ = ["WatermarkService"]
