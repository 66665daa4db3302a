from hirest_tpu.utils.meters import LossMeter  # noqa: F401
