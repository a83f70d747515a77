from easygaussiansplatting_tpu.models.camera import Camera

__all__ = ["Camera"]
