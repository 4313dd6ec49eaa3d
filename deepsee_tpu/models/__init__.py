from deepsee_tpu.models.generator import DeepSEEGenerator
from deepsee_tpu.models.encoder import (
    CombinedStyleEncoder,
    FullStyleEncoder,
    MiniStyleEncoder,
    build_encoder,
)
from deepsee_tpu.models.discriminator import MultiscaleDiscriminator
