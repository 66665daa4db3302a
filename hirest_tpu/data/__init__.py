from hirest_tpu.data.annotations import build_examples  # noqa: F401
from hirest_tpu.data.features import FeatureStore  # noqa: F401
from hirest_tpu.data.batching import TaskBatcher, collate  # noqa: F401
from hirest_tpu.data.multitask import MultitaskSchedule  # noqa: F401
