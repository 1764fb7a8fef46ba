from tpu_splat.core.types import Cameras, GaussianCloud, SfMScene, CameraModel

__all__ = ["Cameras", "GaussianCloud", "SfMScene", "CameraModel"]
