from hirest_tpu.ops.attention import fused_attention  # noqa: F401
