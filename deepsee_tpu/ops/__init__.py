from deepsee_tpu.ops.resize import (
    resize2d,
    resize_matrix,
    upsample_nearest_2x,
)
from deepsee_tpu.ops.preprocess import (
    downsample_image,
    one_hot_label,
)
from deepsee_tpu.ops.norms import instance_norm_2d
from deepsee_tpu.ops.pooling import avg_pool_3x3_s2
