from instantsplat_tpu.pipelines.config import (  # noqa: F401
    ModelParams,
    PipelineParams,
)
from instantsplat_tpu.pipelines.init_geo_pipeline import run_init_geo  # noqa: F401
from instantsplat_tpu.pipelines.metrics_pipeline import run_metrics  # noqa: F401
from instantsplat_tpu.pipelines.render_pipeline import run_render  # noqa: F401
from instantsplat_tpu.pipelines.train_pipeline import run_training  # noqa: F401
from instantsplat_tpu.pipelines.trainer import (  # noqa: F401
    TrainerConfig,
    train_joint,
)
