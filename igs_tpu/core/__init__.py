from igs_tpu.core.gaussians import Gaussians
from igs_tpu.core.camera import Camera

__all__ = ["Gaussians", "Camera"]
