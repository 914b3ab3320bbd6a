from slak_tpu.data.transforms import (
    TrainTransform, EvalTransform, IMAGENET_MEAN, IMAGENET_STD,
    DEFAULT_CROP_PCT,
)
from slak_tpu.data.auto_augment import RandAugment, rand_augment_from_config
from slak_tpu.data.mixup import MixupConfig, mixup_cutmix, mixup_target
from slak_tpu.data.random_erasing import RandomErasingConfig, random_erasing
from slak_tpu.data.datasets import (
    ImageFolderDataset, CIFAR100Dataset, SyntheticDataset, build_dataset,
)
from slak_tpu.data.loader import BatchLoader, device_prefetch

__all__ = [
    "TrainTransform", "EvalTransform", "IMAGENET_MEAN", "IMAGENET_STD",
    "DEFAULT_CROP_PCT",
    "RandAugment", "rand_augment_from_config",
    "MixupConfig", "mixup_cutmix", "mixup_target",
    "RandomErasingConfig", "random_erasing",
    "ImageFolderDataset", "CIFAR100Dataset", "SyntheticDataset",
    "build_dataset", "BatchLoader", "device_prefetch",
]
