"""GAN loss parity vs the reference GANLoss for all four modes, and the
feature-matching loss formula."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from ref_utils import make_ref_opt  # sets up reference path

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.losses import feature_matching_loss, gan_loss


def _fake_disc_out(rng, num_d=2, layers=5, b=2):
    """list[scale] of list[layer] with the logit last (multiscale shape)."""
    out = []
    for d in range(num_d):
        scale = [rng.randn(b, 8 >> d, 8 >> d, 4).astype(np.float32)
                 for _ in range(layers - 1)]
        scale.append(rng.randn(b, 4 >> d, 4 >> d, 1).astype(np.float32))
        out.append(scale)
    return out


def _to_ref_format(pred):
    # reference: list of lists of NCHW tensors
    return [[torch.from_numpy(np.transpose(t, (0, 3, 1, 2))) for t in scale]
            for scale in pred]


@pytest.mark.parametrize("mode", ["hinge", "ls", "original", "w"])
@pytest.mark.parametrize("target_is_real,for_d", [
    (True, True), (False, True), (True, False),
])
def test_gan_loss_parity(mode, target_is_real, for_d):
    from deepsee_models.networks.loss import GANLoss

    if mode == "hinge" and not for_d and not target_is_real:
        pytest.skip("generator hinge loss must aim for real")

    rng = np.random.RandomState(0)
    pred = _fake_disc_out(rng)
    ref = GANLoss(mode, tensor=torch.FloatTensor,
                  opt=make_ref_opt(tiny_test_experiment().model))
    want = ref(_to_ref_format(pred), target_is_real,
               for_discriminator=for_d)
    want = float(want.mean())

    got = float(gan_loss([[jnp.asarray(t) for t in s] for s in pred],
                         target_is_real, mode=mode, for_discriminator=for_d))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_feature_matching_parity():
    rng = np.random.RandomState(1)
    pred_fake = _fake_disc_out(rng)
    pred_real = _fake_disc_out(rng)
    lambda_feat, num_d = 10.0, 2

    # reference formula (sr_model.py:529-539)
    want = 0.0
    for i in range(num_d):
        for j in range(len(pred_fake[i]) - 1):
            l1 = float(np.abs(pred_fake[i][j] - pred_real[i][j]).mean())
            want += l1 * lambda_feat / num_d

    got = float(feature_matching_loss(
        [[jnp.asarray(t) for t in s] for s in pred_fake],
        [[jnp.asarray(t) for t in s] for s in pred_real], lambda_feat))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_guided_model_train_smoke():
    """Fused train step for the guided (fullstyle) model with guiding images."""
    import dataclasses
    import jax

    from deepsee_tpu.config import tiny_test_experiment
    from deepsee_tpu.data import DataLoader, SyntheticDataset
    from deepsee_tpu.system import SRSystem
    from deepsee_tpu.train import create_train_state, make_train_step

    exp = tiny_test_experiment()
    exp = exp.replace(model=dataclasses.replace(
        exp.model, net_e="fullstyle", guiding_style_image=True,
        noisy_style_scale=0.05))
    system = SRSystem(exp)
    state = create_train_state(system, jax.random.PRNGKey(0))
    step = make_train_step(system, donate=False)

    ds = SyntheticDataset(exp, length=4)
    batch = next(iter(DataLoader(ds, 2, shuffle=False, num_workers=1,
                                 prefetch=0)))
    arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
    assert "guiding_image" in arrays
    state, logs = step(state, arrays)
    for k, v in jax.device_get(logs).items():
        assert np.isfinite(v), (k, v)
