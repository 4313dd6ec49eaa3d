"""Helpers to instantiate reference (torch) modules for parity tests."""

from types import SimpleNamespace

import numpy as np
import torch

from conftest import add_reference_to_path

add_reference_to_path()


def make_ref_opt(cfg, is_train=True):
    """Build the argparse-like namespace the reference modules expect from a
    deepsee_tpu ModelConfig."""
    return SimpleNamespace(
        efficient=False,
        regional_style_size=cfg.regional_style_size,
        max_fm_size=cfg.max_fm_size,
        model_parallel_mode=0,
        norm_G=cfg.norm_g,
        norm_E=cfg.norm_e,
        norm_D=cfg.norm_d,
        semantic_nc=cfg.semantic_nc,
        label_nc=cfg.label_nc,
        contain_dontcare_label=cfg.contain_dontcare_label,
        output_nc=cfg.output_nc,
        add_noise=cfg.add_noise,
        netE=cfg.net_e,
        noisy_style_scale=cfg.noisy_style_scale,
        noisy_style_dist=cfg.noisy_style_dist,
        nef=cfg.nef,
        ngf=cfg.ngf,
        ndf=cfg.ndf,
        random_style_matrix=cfg.random_style_matrix,
        crop_size=cfg.crop_size,
        start_size=cfg.start_size,
        load_size=cfg.load_size,
        aspect_ratio=cfg.aspect_ratio,
        num_upsampling_layers="normal",
        num_D=cfg.num_d,
        n_layers_D=cfg.n_layers_d,
        no_ganFeat_loss=False,
        netD_subarch="n_layer",
        gpu_info=False,
        gpu_ids=[],
        isTrain=is_train,
        name="parity_test",
    )


def to_nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))
