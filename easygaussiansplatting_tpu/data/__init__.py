from easygaussiansplatting_tpu.data.fixtures import example_camera, example_gaussians

__all__ = ["example_gaussians", "example_camera"]
