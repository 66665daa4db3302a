from hirest_tpu.models.eva_clip import EvaTextTower, EvaVisionTower  # noqa: F401
from hirest_tpu.models.caption import VisualEncoder, CaptionDecoder  # noqa: F401
from hirest_tpu.models.joint import MomentModel  # noqa: F401
from hirest_tpu.models.clip_resnet import ClipResNetTower, convert_clip_resnet  # noqa: F401
