from hirest_tpu.eval.metrics import (  # noqa: F401
    compute_iou,
    evaluate_video_retrieval,
    evaluate_moment_retrieval,
    compute_step_bound_scores,
    nms_1d,
    preprocess_moment_bounds,
    Categories,
)
