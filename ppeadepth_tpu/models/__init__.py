from .replknet import RepLKNet, REPLK_CONFIGS  # noqa: F401
from .depth_decoder import DepthDecoderV2  # noqa: F401
from .pose import PoseDecoder  # noqa: F401
from .resnet import ResnetEncoder  # noqa: F401
from .matching_encoder import RepLKMatching  # noqa: F401
from .resnet_matching import ResnetEncoderMatching, DepthDecoder  # noqa: F401
from .pose import PoseCNN  # noqa: F401
from .repdepth import RepDepth  # noqa: F401
