from igs_tpu.ops.rasterize import rasterize, RasterSettings

__all__ = ["rasterize", "RasterSettings"]
