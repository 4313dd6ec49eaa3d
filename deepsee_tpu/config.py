"""Typed configuration for deepsee_tpu.

Replaces the reference's argparse-reflection option system (options/base_options.py,
options/train_options.py, options/test_options.py, options/configurations.py) with
frozen dataclasses. Every field that affects math is represented; defaults mirror
the reference defaults (cited per-field below).
"""

from __future__ import annotations

import dataclasses
import json
import math
import re
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


# ---------------------------------------------------------------------------
# Norm-config strings
# ---------------------------------------------------------------------------
# The reference encodes generator normalization as a string like
# "spectrallateseansyncbatch3x3" (options/base_options.py:35-37), parsed by a
# regex in deepsee_models/networks/normalization.py:75-81,129-131.  We parse it
# once into a structured form.

@dataclass(frozen=True)
class NormGSpec:
    """Structured form of the reference's `norm_G` config string."""

    spectral: bool = True       # "spectral" prefix -> spectral-norm the resblock convs
    late: bool = True           # "late" -> head block uses plain SPADE (no style)
    sean: bool = True           # "sean" -> SEAN_Block for styled blocks, else SPADE
    param_free: str = "syncbatch"  # instance | syncbatch | batch
    kernel_size: int = 3

    @staticmethod
    def parse(config_text: str) -> "NormGSpec":
        spectral = config_text.startswith("spectral")
        rest = config_text[len("spectral"):] if spectral else config_text
        late = rest.startswith("late")
        m = re.search(r"(?:late)?(?:sean|spade)(\D+)(\d)x\d", rest)
        if m is None:
            raise ValueError(f"Unparseable norm_G config: {config_text!r}")
        return NormGSpec(
            spectral=spectral,
            late=late,
            sean="sean" in rest,
            param_free=str(m.group(1)),
            kernel_size=int(m.group(2)),
        )

    @property
    def param_free_kind(self) -> str:
        """Map the reference's nested substring checks (normalization.py:84-92)."""
        if "instance" in self.param_free:
            return "instance"
        if "syncbatch" in self.param_free:
            return "syncbatch"
        if "batch" in self.param_free:
            return "batch"
        raise ValueError(f"Unknown param-free norm: {self.param_free}")


def parse_nonspade_norm(norm_type: str) -> Tuple[bool, str]:
    """Parse the encoder/discriminator norm string ("spectralinstance", ...).

    Mirrors deepsee_models/networks/normalization.py:19-54: an optional
    "spectral" prefix then one of none|batch|sync_batch|instance.
    Returns (spectral, subnorm_type).
    """
    spectral = norm_type.startswith("spectral")
    sub = norm_type[len("spectral"):] if spectral else norm_type
    if sub not in ("", "none", "batch", "sync_batch", "instance"):
        raise ValueError(f"Unrecognized norm type: {norm_type!r}")
    return spectral, (sub or "none")


# ---------------------------------------------------------------------------
# Model config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (reference: options/base_options.py)."""

    # sizes
    start_size: int = 16            # base_options.py:78
    crop_size: int = 128            # base_options.py:68
    load_size: int = 128            # base_options.py:66
    aspect_ratio: float = 1.0       # base_options.py:70

    # channels
    label_nc: int = 19              # base_options.py:72
    contain_dontcare_label: bool = False
    output_nc: int = 3              # base_options.py:76
    ngf: int = 32                   # base_options.py:119
    nef: int = 32                   # base_options.py:141
    ndf: int = 32                   # train_options.py:65
    regional_style_size: int = 128  # base_options.py:125

    # normalization configuration
    norm_g: str = "spectrallateseansyncbatch3x3"  # base_options.py:35-37
    norm_d: str = "spectralinstance"              # base_options.py:38
    norm_e: str = "spectralinstance"              # base_options.py:40

    # encoder variant: "combinedstyle" (independent) | "fullstyle" (guided) | ""
    net_e: str = "combinedstyle"    # base_options.py:117
    guiding_style_image: bool = False   # base_options.py:129
    full_style_image: bool = False      # base_options.py:127
    random_style_matrix: bool = False   # base_options.py:133

    # SEAN memory cap + the reference's fm-resize quirk (normalization.py:188-190:
    # when the feature map is capped, the re-upsample assigns interpolate(actv) to
    # BOTH actv and style_map; released checkpoints were trained with this
    # behavior, so we replicate it by default for parity).
    max_fm_size: int = 256          # base_options.py:82
    replicate_fm_resize_quirk: bool = True
    # TPU-native experiment, MEASURED OFF: when the capped SEAN maps would
    # be nearest-2x-upsampled before the 3x3 modulation conv (the 512px
    # hot path), compute the conv at LOW resolution with the folded
    # transposed kernel instead (models/normalization.py::
    # _conv_on_nearest_up2) — exact same math, 4/9 of the MACs.  All three
    # fold formulations benchmarked SLOWER than the literal
    # upsample-then-conv on the real chip (train step 364-538 vs 320 ms,
    # fwd 62.8 vs 57.7 ms): XLA:TPU fuses the nearest-upsample broadcast
    # into the conv for free, and the fold's layout-changing copies cost
    # more at the HBM roof than the saved MXU time.  Kept as an opt-in
    # with exactness tests (tests/test_folded_modconv.py).
    fold_upsampled_mod_conv: bool = False

    # stochastic style / noise
    add_noise: bool = False         # base_options.py:44 (presets switch it on)
    noisy_style_scale: float = 0.2  # base_options.py:46
    noisy_style_dist: str = "uniform"  # base_options.py:48

    # discriminator
    num_d: int = 2                  # discriminator.py:19
    n_layers_d: int = 4             # discriminator.py:70

    # downsampling HR->LR on device (data/preprocessor.py:29-31)
    downsampling_method: str = "bicubic"  # base_options.py:84

    # compute dtype for the jitted forward/backward ("bfloat16" or "float32").
    # Params are always float32; this is the activation/matmul dtype.
    compute_dtype: str = "bfloat16"

    # init
    init_type: str = "xavier"       # base_options.py:121
    init_variance: float = 0.02     # base_options.py:123

    @property
    def semantic_nc(self) -> int:
        # base_options.py:233
        return self.label_nc + (1 if self.contain_dontcare_label else 0)

    @property
    def n_blocks(self) -> int:
        # networks/sr.py:27
        return int(math.log2(self.crop_size) - math.log2(self.start_size))

    @property
    def norm_g_spec(self) -> NormGSpec:
        return NormGSpec.parse(self.norm_g)

    @property
    def model_variant(self) -> str:
        # sr_model.py:28
        return "guided" if "full" in self.net_e else "independent"

    @property
    def use_encoder(self) -> bool:
        return bool(self.net_e) and self.net_e != "none"

    @property
    def magnification(self) -> int:
        return self.crop_size // self.start_size


# ---------------------------------------------------------------------------
# Train config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TrainConfig:
    """Optimization hyper-parameters (reference: options/train_options.py)."""

    batch_size: int = 4             # base_options.py:54
    lr: float = 2e-4                # train_options.py:59
    beta1: float = 0.0              # train_options.py:36
    beta2: float = 0.9              # train_options.py:38
    no_ttur: bool = False           # train_options.py:40 (TTUR: G=lr/2, D=2lr)
    d_steps_per_g: int = 1          # train_options.py:61
    niter: int = 50                 # train_options.py:31
    niter_decay: int = 25           # train_options.py:33
    lambda_feat: float = 10.0       # train_options.py:67
    lambda_vgg: float = 10.0        # train_options.py:69
    no_ganfeat_loss: bool = False   # train_options.py:72
    no_vgg_loss: bool = False       # train_options.py:74
    gan_mode: str = "hinge"         # train_options.py:76
    gradient_clip: float = -1.0     # train_options.py:80 (clip-by-value; -1 = off)
    remat: bool = False             # replaces --efficient gradient checkpointing
    # remat flavor: "full" recomputes whole blocks in backward (min memory);
    # "convs" saves TRUNK conv outputs and recomputes norms/resizes AND the
    # folded SEAN/SPADE modulation convs (~0.5x a trunk conv each — saving
    # those too was measured to blow past HBM at 256^2 b16)
    remat_policy: str = "full"
    # Reuse the G-step fake for the D update instead of regenerating with
    # the just-updated G (the reference regenerates: sr_model.py:550-553
    # runs generate_fake again inside compute_discriminator_loss, after the
    # G optimizer already stepped in train.py:40-44).  Reusing is the
    # classic single-forward GAN schedule (DCGAN/StyleGAN style: D trains
    # on the exact fake G just trained on) — a deliberate, opt-in deviation
    # that removes one full generator forward per step (measured 1.27x step
    # throughput at 256^2, 1.21x at 512^2; table in ARCHITECTURE.md).
    reuse_fake: bool = False

    # Pretrained perceptual-network weight files (torchvision-format .pth or
    # .npz).  The reference trains with torchvision's *pretrained* VGG19
    # (networks/loss.py:105-119, architecture.py:151-181); without a file the
    # VGG loss runs on random features — valid wiring, NOT reference-
    # equivalent training (a loud warning is printed).  inception/alexnet
    # weights feed the in-training evaluation hook (FID / LPIPS).
    vgg_weights: str = ""
    inception_weights: str = ""
    alexnet_weights: str = ""

    # periodic actions (train_options.py:13-20,45-52)
    display_freq: int = 20000
    print_freq: int = 1000
    save_latest_freq: int = 3000
    save_epoch_freq: int = 1
    evaluation_freq: int = 100000
    evaluation_start_epoch: int = 0
    num_evaluation_samples: int = 1000
    evaluate_val_set: bool = False

    seed: int = 0

    def g_lr(self) -> float:
        return self.lr if self.no_ttur else self.lr / 2

    def d_lr(self) -> float:
        return self.lr if self.no_ttur else self.lr * 2

    def epoch_lr_scale(self, epoch: int) -> float:
        """Linear decay to zero over niter_decay epochs after niter epochs.

        Mirrors managers/trainer_manager.py:76-96 (update_learning_rate).
        """
        if epoch <= self.niter:
            return 1.0
        total = self.niter + self.niter_decay
        return max(0.0, (total - epoch) / max(1, self.niter_decay))


# ---------------------------------------------------------------------------
# Data config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DataConfig:
    """Dataset + host-side transform configuration (reference: data/)."""

    dataset: str = "celebamaskhq"   # base_options.py:26
    image_dir: str = ""
    label_dir: str = ""
    image_dir_val: str = ""
    label_dir_val: str = ""
    identities_file: str = ""       # celebamaskhq_dataset.py identities_all.csv
    preprocess_mode: str = "resize_and_crop"   # base_dataset.py:26 set_defaults
    center_crop_size: Optional[int] = None     # 178 for CelebA
    no_flip: bool = False
    serial_batches: bool = False
    max_dataset_size: Optional[int] = None
    no_pairing_check: bool = False
    cache_filelist_read: bool = False   # image_folder.py files.list cache
    cache_filelist_write: bool = False
    phase: str = "train"
    # Native (C++) host codec, deepsee_tpu/native: "auto" uses it when the
    # prebuilt library loads AND the preprocess mode is in its bit-exact
    # envelope, silently falling back to PIL otherwise; "on" requires it;
    # "off" forces PIL.  The codec replicates PIL's resampler exactly
    # (tests/test_native_codec.py), so this is a speed knob, not a math one.
    native_codec: str = "auto"
    # Opt-in approximate JPEG fast path: DCT-scaled decode near the target
    # size (NOT bit-exact with PIL; ~45 dB vs the exact pipeline).  For
    # throughput-bound serving/eval sweeps, never for parity runs.
    native_scaled_decode: bool = False


# ---------------------------------------------------------------------------
# Mesh / parallelism config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout (replaces gpu_ids / model_parallel_mode).

    The reference expresses data parallelism with nn.DataParallel and model
    parallelism with manual `.cuda(n)` moves (managers/base_manager.py:17-21,
    networks/sr.py:73-92).  Here both are axes of one jax.sharding.Mesh:

      * "data"  — batch axis (DP); norm stats sync over it for free because
        jitted reductions over globally-sharded arrays are global.
      * "model" — channel axis of the 512-wide generator trunk (TP), replacing
        model_parallel_mode for the 32x 512^2 config.
    """

    data_axis: int = 1
    model_axis: int = 1
    # how the "model" axis is used: "tensor" channel-shards the trunk
    # kernels; "spatial" H-shards activations (conv halo exchange via
    # GSPMD) — preferred when feature maps dominate memory (512px configs)
    partition: str = "tensor"
    # extra data-parallel axis ACROSS slices (multi-slice pods): only the
    # batch dim and the gradient all-reduce cross the slow DCN network;
    # model/spatial sharding stays within a slice on ICI.  Size 1 (single
    # slice) keeps the mesh semantics identical.
    dcn_axis: int = 1

    @property
    def n_devices(self) -> int:
        return self.dcn_axis * self.data_axis * self.model_axis

    @property
    def spatial(self) -> bool:
        return self.partition == "spatial"


# ---------------------------------------------------------------------------
# Experiment = the whole bundle
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Experiment:
    name: str = "8x_independent_128x128"
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    checkpoints_dir: str = "./checkpoints"
    results_dir: str = "./results"
    is_train: bool = True

    # explorative-inference knobs (options/test_options.py)
    region_idx: Optional[Tuple[int, ...]] = None
    n_interpolation: int = 5
    noise_delta: float = 0.0
    noise_dist: str = "normal"
    manipulate_scale: float = 1.0

    def replace(self, **kw: Any) -> "Experiment":
        return dataclasses.replace(self, **kw)

    # -- (de)serialization ---------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Experiment":
        raw = json.loads(s)
        return Experiment(
            name=raw.get("name", "experiment"),
            model=ModelConfig(**raw.get("model", {})),
            train=TrainConfig(**raw.get("train", {})),
            data=DataConfig(**raw.get("data", {})),
            mesh=MeshConfig(**raw.get("mesh", {})),
            **{k: (tuple(v) if k == "region_idx" and v is not None else v)
               for k, v in raw.items()
               if k not in ("name", "model", "train", "data", "mesh")},
        )


# ---------------------------------------------------------------------------
# Named presets (reference: options/configurations.py)
# ---------------------------------------------------------------------------

def _apply_variant(exp: Experiment, name: str) -> Experiment:
    if "independent" in name:
        # configurations.py:3-6
        model = exp.model
        return exp.replace(model=dataclasses.replace(
            model, net_e="combinedstyle", noisy_style_scale=0.2))
    if "guided" in name:
        # configurations.py:9-13
        model = exp.model
        return exp.replace(model=dataclasses.replace(
            model, net_e="fullstyle", noisy_style_scale=0.05,
            guiding_style_image=True))
    raise ValueError(f"Preset name must contain 'independent' or 'guided': {name}")


def get_preset(name: str, **overrides: Any) -> Experiment:
    """Named experiment presets mirroring options/configurations.py:16-43."""
    exp = Experiment(name=name)
    m = exp.model
    if "128x128" in name and "8x_" in name:
        m = dataclasses.replace(m, start_size=16, crop_size=128, load_size=128,
                                add_noise=True)
        # celeba_dataset.py:38-40 set_defaults: center_crop_and_resize with a
        # 178px face crop BEFORE the resize (labels still use 'resize' mode
        # only -- data/datasets.py handles that per-sample).
        d = dataclasses.replace(exp.data, dataset="celeba",
                                preprocess_mode="center_crop_and_resize",
                                center_crop_size=178)
    elif "256x256" in name and "8x_" in name:
        m = dataclasses.replace(m, start_size=32, crop_size=256, load_size=256,
                                add_noise=True, max_fm_size=256)
        d = dataclasses.replace(exp.data, dataset="celebamaskhq")
    elif "32x_" in name:
        m = dataclasses.replace(m, start_size=16, crop_size=512, load_size=512,
                                add_noise=False, max_fm_size=256)
        d = dataclasses.replace(exp.data, dataset="celebamaskhq")
    else:
        raise ValueError(f"Invalid preset name: {name!r}")
    exp = exp.replace(model=m, data=d)
    exp = _apply_variant(exp, name)
    if overrides:
        exp = exp.replace(**overrides)
    return exp


# A tiny config for unit tests / dry runs: full code path, minimal FLOPs.
def tiny_test_experiment(**overrides: Any) -> Experiment:
    exp = Experiment(
        name="tiny_test",
        model=ModelConfig(start_size=8, crop_size=32, load_size=32,
                          ngf=4, nef=4, ndf=4, regional_style_size=16,
                          max_fm_size=32, add_noise=True,
                          compute_dtype="float32"),
        train=TrainConfig(batch_size=2, num_evaluation_samples=4),
    )
    return exp.replace(**overrides) if overrides else exp
