"""Metric parity vs the reference implementations (cv2 / torch)."""

import numpy as np
import jax.numpy as jnp
import torch

from ref_utils import to_nchw  # also sets up reference sys.path

from deepsee_tpu.eval.metrics import (MetricsAccumulator, ms_ssim, psnr,
                                      rmse, ssim_matlab, to_uint8_values)


def _pair(seed=0, b=2, hw=64):
    rng = np.random.RandomState(seed)
    real = np.tanh(rng.randn(b, hw, hw, 3)).astype(np.float32)
    fake = np.clip(real + rng.randn(b, hw, hw, 3) * 0.1, -1, 1).astype(np.float32)
    return fake, real


def test_to_uint8_matches_tensor2im():
    from util.util import tensor2im

    fake, _ = _pair()
    want = tensor2im(to_nchw(fake))  # (B,H,W,3) uint8
    got = np.asarray(to_uint8_values(jnp.asarray(fake)))
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_psnr_ssim_parity_with_basicsr():
    from evaluator.calculate_PSNR_SSIM import calculate_psnr, calculate_ssim
    from util.util import tensor2im

    fake, real = _pair()
    f255 = np.asarray(to_uint8_values(jnp.asarray(fake)))
    r255 = np.asarray(to_uint8_values(jnp.asarray(real)))
    fake_np = tensor2im(to_nchw(fake))
    real_np = tensor2im(to_nchw(real))

    got_psnr = np.asarray(psnr(jnp.asarray(f255), jnp.asarray(r255)))
    got_ssim = np.asarray(ssim_matlab(jnp.asarray(f255), jnp.asarray(r255)))
    for i in range(fake.shape[0]):
        want_p = calculate_psnr(fake_np[i], real_np[i])
        want_s = calculate_ssim(fake_np[i], real_np[i])
        np.testing.assert_allclose(got_psnr[i], want_p, rtol=1e-4)
        np.testing.assert_allclose(got_ssim[i], want_s, rtol=1e-4, atol=1e-5)


def test_ms_ssim_parity_with_reference():
    from evaluator.ssim import msssim as ref_msssim

    fake, real = _pair(seed=3, hw=256)  # needs >=176 px for 5 levels
    f255 = (fake + 1.0) * 127.5
    r255 = (real + 1.0) * 127.5
    got = np.asarray(ms_ssim(jnp.asarray(f255), jnp.asarray(r255)))
    for i in range(fake.shape[0]):
        want = ref_msssim(torch.from_numpy(f255[i]).permute(2, 0, 1)[None],
                          torch.from_numpy(r255[i]).permute(2, 0, 1)[None],
                          size_average=True, val_range=255).numpy()
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_rmse_parity():
    fake, real = _pair(seed=5)
    mse = torch.nn.MSELoss(reduction="none")
    want = mse(to_nchw(fake), to_nchw(real)).mean(dim=[1, 2, 3]).sqrt().numpy()
    got = np.asarray(rmse(jnp.asarray(fake), jnp.asarray(real)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_accumulator():
    acc = MetricsAccumulator()
    fake, real = _pair(seed=7, hw=176)
    acc.add_batch(jnp.asarray(fake), jnp.asarray(real))
    acc.add_batch(jnp.asarray(real), jnp.asarray(real))  # perfect pair
    res = acc.result()
    assert res["n_samples"] == 4
    assert res["ssim/mean"] <= 1.0
    assert np.isinf(np.asarray(acc.buffers["psnr"])).any()  # identical pair
