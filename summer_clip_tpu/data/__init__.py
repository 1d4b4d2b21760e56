"""Data layer: Datum/dataset framework, transforms, batchers, 11 datasets."""

from summer_clip_tpu.data.core import (  # noqa: F401
    Datum, DatasetBase, read_json, write_json, read_split, save_split,
    split_trainval, generate_fewshot, listdir_nohidden,
)
from summer_clip_tpu.data.transforms import (  # noqa: F401
    CLIP_MEAN, CLIP_STD, EvalTransform, TrainTransform, eval_transform,
    train_transform, load_image,
)
from summer_clip_tpu.data.loader import (  # noqa: F401
    Batch, ImageBatcher, labels_of, prefetch_to_device, pad_to_batch,
)
from summer_clip_tpu.data.datasets import (  # noqa: F401
    build_dataset, DATASET_REGISTRY, register_dataset, SyntheticDataset,
    SyntheticBatcher,
)
from summer_clip_tpu.data.views import DatasetView, TipAdapterDataset, NoImageDataset  # noqa: F401
from summer_clip_tpu.data import array_datasets  # noqa: F401  (registers cifar10/100, mnist)
