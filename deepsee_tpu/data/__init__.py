from deepsee_tpu.data.datasets import (
    CelebADataset,
    CelebAMaskHQDataset,
    SkipSampleException,
    SyntheticDataset,
    create_dataset,
)
from deepsee_tpu.data.loader import DataLoader
from deepsee_tpu.data.transforms import (
    TransformParams,
    apply_image_transform,
    apply_label_transform,
    get_params,
    load_image,
    load_label,
)
