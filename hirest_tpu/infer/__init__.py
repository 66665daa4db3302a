from hirest_tpu.infer.beam import beam_search  # noqa: F401
from hirest_tpu.infer.segmentation import iterative_segmentation  # noqa: F401
