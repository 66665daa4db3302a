from hirest_tpu.train.optim import make_optimizer, linear_warmup_schedule  # noqa: F401
from hirest_tpu.train.losses import (  # noqa: F401
    moment_retrieval_loss,
    moment_segmentation_loss,
    step_captioning_loss,
)
