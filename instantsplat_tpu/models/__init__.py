from instantsplat_tpu.models.camera import Camera  # noqa: F401
from instantsplat_tpu.models.gaussians import GaussianModel  # noqa: F401
