from easygaussiansplatting_tpu.ops.pallas.rasterize import rasterize_pallas

__all__ = ["rasterize_pallas"]
