"""SSIM vs a direct numpy re-evaluation of the reference formula.

Reference semantics: utils/loss_utils.py:55-85 — 11x11 Gaussian window,
sigma=1.5, zero-padded 'SAME' depthwise conv, C1=0.01^2, C2=0.03^2,
size_average mean. The production implementation expresses each 1-D blur as
shifted-slice FMAs; this test pins it to plain dense convolution.
"""

import numpy as np
import jax.numpy as jnp

from instantsplat_tpu.ops.ssim import _gaussian_window, masked_ssim, ssim


def _np_blur(img, win):
    """[C, H, W] separable zero-padded SAME blur, direct summation."""
    c, h, w = img.shape
    k = len(win)
    pad = k // 2
    xp = np.pad(img, ((0, 0), (pad, pad), (0, 0)))
    tmp = np.zeros_like(img)
    for i in range(k):
        tmp += win[i] * xp[:, i : i + h, :]
    xp = np.pad(tmp, ((0, 0), (0, 0), (pad, pad)))
    out = np.zeros_like(img)
    for i in range(k):
        out += win[i] * xp[:, :, i : i + w]
    return out


def _np_ssim(a, b):
    win = _gaussian_window(11, 1.5).astype(np.float64)
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mu1, mu2 = _np_blur(a, win), _np_blur(b, win)
    s1 = _np_blur(a * a, win) - mu1 * mu1
    s2 = _np_blur(b * b, win) - mu2 * mu2
    s12 = _np_blur(a * b, win) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2)
    )
    return m.mean()


def test_ssim_matches_direct_convolution_reference():
    rng = np.random.default_rng(0)
    a = rng.random((3, 37, 53), dtype=np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal((3, 37, 53)).astype(np.float32),
                0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _np_ssim(a, b)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ssim_identity_and_range():
    rng = np.random.default_rng(1)
    a = rng.random((3, 24, 40), dtype=np.float32)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.9999
    b = rng.random((3, 24, 40), dtype=np.float32)
    v = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert -1.0 <= v <= 1.0


def test_ssim_channels_last_agrees():
    rng = np.random.default_rng(2)
    a = rng.random((3, 20, 30), dtype=np.float32)
    b = rng.random((3, 20, 30), dtype=np.float32)
    v1 = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    v2 = float(ssim(jnp.asarray(a.transpose(1, 2, 0)),
                    jnp.asarray(b.transpose(1, 2, 0))))
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_masked_ssim_full_mask_equals_ssim():
    rng = np.random.default_rng(3)
    a = rng.random((3, 20, 30), dtype=np.float32)
    b = rng.random((3, 20, 30), dtype=np.float32)
    full = jnp.ones((20, 30))
    np.testing.assert_allclose(
        float(masked_ssim(jnp.asarray(a), jnp.asarray(b), full)),
        float(ssim(jnp.asarray(a), jnp.asarray(b))),
        rtol=1e-6,
    )
