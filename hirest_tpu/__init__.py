"""HiREST-TPU: a TPU-native framework for hierarchical video retrieval,
moment retrieval, moment segmentation, and step captioning.

Re-designed from the ground up for JAX/XLA/Pallas on TPU with the same
capabilities and I/O contracts as the HiREST reference (j-min/HiREST):
same annotation JSONs in, same prediction-JSON schemas out, same CLI flags.
"""

__version__ = "0.1.0"

from hirest_tpu.config import HirestConfig, get_parser  # noqa: F401
