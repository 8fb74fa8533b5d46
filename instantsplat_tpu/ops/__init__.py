from instantsplat_tpu.ops.knn import mean_knn_dist2  # noqa: F401
from instantsplat_tpu.ops.losses import l1_loss, photometric_loss  # noqa: F401
from instantsplat_tpu.ops.ssim import ssim  # noqa: F401
