"""Released-checkpoint rehearsal (VERDICT r1 item 9).

Saves random-init reference nets with the reference's OWN save path
(util/util.py:217-224 save_network, which wraps the state dict as
{"model": sd}), imports all three through the production
`import_reference_checkpoint` path, and asserts demo-mode forward parity
against the torch nets — closing the save→import→forward seam before real
released checkpoints ever arrive.
"""

import dataclasses
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_utils import make_ref_opt, to_nchw, to_nhwc  # noqa: E402

from deepsee_tpu.config import tiny_test_experiment  # noqa: E402
from deepsee_tpu.inference.modes import encode_only, generate_with_style  # noqa: E402
from deepsee_tpu.system import SRSystem  # noqa: E402
from deepsee_tpu.utils.torch_import import import_reference_checkpoint  # noqa: E402


def test_released_checkpoint_rehearsal(tmp_path):
    from deepsee_models.networks.discriminator import (
        MultiscaleDiscriminator as RefD)
    from deepsee_models.networks.encoder import CombinedstyleEncoder
    from deepsee_models.networks.sr import DeepSEESR
    from util.util import save_network

    exp = tiny_test_experiment()
    cfg = dataclasses.replace(exp.model, add_noise=False)
    exp = exp.replace(model=cfg, is_train=False)

    opt = make_ref_opt(cfg, is_train=False)
    opt.checkpoints_dir = str(tmp_path)
    opt.name = "release"
    os.makedirs(os.path.join(str(tmp_path), "release"), exist_ok=True)

    torch.manual_seed(0)
    nets = {"SR": DeepSEESR(opt), "E": CombinedstyleEncoder(opt),
            "D": RefD(opt)}
    for tag, net in nets.items():
        net.eval()
        save_network(net, tag, "latest", opt)  # the reference's own saver

    ckpt_dir = os.path.join(str(tmp_path), "release")
    system = SRSystem(exp)
    variables = import_reference_checkpoint(system, ckpt_dir, epoch="latest",
                                            include_d=True)
    assert variables.d is not None

    # demo-mode pipeline on both sides, sharing the on-device preprocess
    rng = np.random.RandomState(0)
    hr = np.tanh(rng.randn(1, cfg.crop_size, cfg.crop_size, 3)
                 ).astype(np.float32)
    lab = rng.randint(0, cfg.label_nc,
                      (1, cfg.crop_size, cfg.crop_size)).astype(np.int32)
    pre = system.preprocess({"image_hr": jnp.asarray(hr),
                             "label": jnp.asarray(lab)})
    seg = np.asarray(pre["input_semantics"])
    lr = np.asarray(pre["image_lr"])

    style = encode_only(system, variables, pre, encode_full=True)
    fake = generate_with_style(system, variables, pre, style)

    with torch.no_grad():
        style_t, _ = nets["E"](to_nchw(hr), to_nchw(seg), mode="full",
                               no_noise=True)
        want = to_nhwc(nets["SR"](to_nchw(lr), to_nchw(seg), style_t))

    np.testing.assert_allclose(np.asarray(style), style_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fake), want, rtol=1e-3, atol=1e-4)

    # discriminator side of the seam (eval systems don't build D; the
    # importer inits one to fill from the checkpoint)
    from deepsee_tpu.models.discriminator import MultiscaleDiscriminator

    x = np.concatenate([seg, np.asarray(fake)], axis=-1).astype(np.float32)
    got_d = MultiscaleDiscriminator(cfg).apply(variables.d, jnp.asarray(x),
                                               train=False)
    with torch.no_grad():
        want_d = nets["D"](to_nchw(x))
    for scale_got, scale_want in zip(got_d, want_d):
        np.testing.assert_allclose(np.asarray(scale_got[-1]),
                                   to_nhwc(scale_want[-1]),
                                   rtol=1e-3, atol=1e-4)
