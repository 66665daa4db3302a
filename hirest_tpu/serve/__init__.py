from hirest_tpu.serve.engine import ServingEngine  # noqa: F401
from hirest_tpu.serve.server import make_server  # noqa: F401
