from instantsplat_tpu.opt.gaussian_opt import (  # noqa: F401
    AdamState,
    GaussianOptimizer,
    OptimizationConfig,
    confidence_to_lr,
)
