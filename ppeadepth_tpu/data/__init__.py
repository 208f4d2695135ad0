from .mono_dataset import MonoDataset  # noqa: F401
from .kitti import (  # noqa: F401
    KITTIDataset,
    KITTIRAWDataset,
    KITTIOdomDataset,
    KITTIDepthDataset,
)
from .cityscapes import (  # noqa: F401
    CityscapesPreprocessedDataset,
    CityscapesEvalDataset,
)
from .ddad import DDADNpzDataset  # noqa: F401
from .loader import DataLoader, device_prefetch  # noqa: F401

DATASETS = {
    "kitti": KITTIRAWDataset,
    "kitti_odom": KITTIOdomDataset,
    "cityscapes_preprocessed": CityscapesPreprocessedDataset,
    "cityscapes_eval": CityscapesEvalDataset,
    "ddad": DDADNpzDataset,
}
