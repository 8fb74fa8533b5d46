import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantsplat_tpu.ops import rasterize


def seq_composite(mean2d, conic, logo, colors, valid, H, W, bg):
    """Literal sequential transcription of the reference CUDA compositing
    loop (alpha clamp 0.99, 1/255 cutoff, power>0 skip, latched 1e-4 T
    termination, background blend). The ground truth for the vectorized scan.
    """
    n = mean2d.shape[0]
    img = np.zeros((H, W, 3))
    alpha_map = np.zeros((H, W))
    for y in range(H):
        for x in range(W):
            T = 1.0
            C = np.zeros(3)
            for i in range(n):
                if not valid[i]:
                    continue
                a, b, c = conic[i]
                dx, dy = x - mean2d[i, 0], y - mean2d[i, 1]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0:
                    continue
                alpha = min(0.99, np.exp(power + logo[i]))
                if alpha < 1.0 / 255.0:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                C += colors[i] * alpha * T
                T = test_T
            img[y, x] = C + T * bg
            alpha_map[y, x] = 1 - T
    return img, alpha_map


def random_scene(key, n, H, W, opacity_hi=0.9):
    ks = jax.random.split(key, 6)
    mean2d = jax.random.uniform(ks[0], (n, 2), minval=-2, maxval=max(H, W) + 2)
    # random SPD conics with a range of footprint sizes
    L = jax.random.uniform(ks[1], (n, 2), minval=0.05, maxval=1.0)
    theta = jax.random.uniform(ks[2], (n,), minval=0, maxval=np.pi)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    a = ct**2 * L[:, 0] + st**2 * L[:, 1]
    c = st**2 * L[:, 0] + ct**2 * L[:, 1]
    b = ct * st * (L[:, 0] - L[:, 1])
    conic = jnp.stack([a, b, c], -1)
    logo = jnp.log(jax.random.uniform(ks[3], (n,), minval=0.05, maxval=opacity_hi))
    colors = jax.random.uniform(ks[4], (n, 3))
    depth = jax.random.uniform(ks[5], (n,), minval=0.5, maxval=10.0)
    valid = jnp.arange(n) % 7 != 3  # a few invalid entries
    order = rasterize.sort_by_depth(depth, valid)
    return (
        mean2d[order],
        conic[order],
        logo[order],
        colors[order],
        depth[order],
        valid[order],
    )


@pytest.mark.parametrize("chunk", [4, 16, 64])
def test_composite_matches_sequential_reference(chunk):
    H = W = 16
    mean2d, conic, logo, colors, depth, valid = random_scene(
        jax.random.PRNGKey(0), 37, H, W
    )
    bg = jnp.array([0.1, 0.2, 0.3])
    out = rasterize.composite(
        mean2d, conic, logo, colors, depth, valid, H, W, bg=bg, chunk=chunk
    )
    ref_img, ref_alpha = seq_composite(
        np.asarray(mean2d),
        np.asarray(conic),
        np.asarray(logo),
        np.asarray(colors),
        np.asarray(valid),
        H,
        W,
        np.asarray(bg),
    )
    np.testing.assert_allclose(out.rgb, ref_img, atol=1e-5)
    np.testing.assert_allclose(out.alpha, ref_alpha, atol=1e-5)


def test_composite_termination_latch():
    """Stacked near-opaque Gaussians: T crosses 1e-4 and later ones must be
    excluded exactly as the latched sequential loop does."""
    H = W = 8
    n = 40
    mean2d = jnp.tile(jnp.array([[3.5, 3.5]]), (n, 1))
    conic = jnp.tile(jnp.array([[0.02, 0.0, 0.02]]), (n, 1))
    logo = jnp.full((n,), jnp.log(0.95))
    colors = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    depth = jnp.arange(n, dtype=jnp.float32)
    valid = jnp.ones(n, bool)
    bg = jnp.zeros(3)
    out = rasterize.composite(mean2d, conic, logo, colors, depth, valid, H, W, bg=bg, chunk=8)
    ref_img, ref_alpha = seq_composite(
        np.asarray(mean2d), np.asarray(conic), np.asarray(logo),
        np.asarray(colors), np.asarray(valid), H, W, np.zeros(3)
    )
    np.testing.assert_allclose(out.rgb, ref_img, atol=1e-5)
    np.testing.assert_allclose(out.alpha, ref_alpha, atol=1e-5)


def test_empty_scene_renders_background():
    H = W = 4
    out = rasterize.composite(
        jnp.zeros((5, 2)),
        jnp.tile(jnp.array([[1.0, 0.0, 1.0]]), (5, 1)),
        jnp.zeros(5),
        jnp.ones((5, 3)),
        jnp.ones(5),
        jnp.zeros(5, bool),
        H,
        W,
        bg=jnp.array([0.25, 0.5, 0.75]),
        chunk=8,
    )
    np.testing.assert_allclose(out.rgb, np.tile([0.25, 0.5, 0.75], (H, W, 1)), atol=1e-6)
    np.testing.assert_allclose(out.alpha, np.zeros((H, W)), atol=1e-6)


def test_front_occludes_back():
    H = W = 9
    mean2d = jnp.array([[4.0, 4.0], [4.0, 4.0]])
    conic = jnp.tile(jnp.array([[0.5, 0.0, 0.5]]), (2, 1))
    logo = jnp.log(jnp.array([0.99, 0.99]))
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    depth = jnp.array([1.0, 2.0])
    valid = jnp.ones(2, bool)
    order = rasterize.sort_by_depth(depth, valid)
    out = rasterize.composite(
        mean2d[order], conic[order], logo[order], colors[order],
        depth[order], valid[order], H, W, bg=jnp.zeros(3), chunk=4,
    )
    center = np.asarray(out.rgb[4, 4])
    assert center[0] > 0.9, center  # red (front) dominates
    assert center[1] < 0.1, center


def test_composite_gradients_finite_and_nonzero():
    H = W = 12
    mean2d, conic, logo, colors, depth, valid = random_scene(
        jax.random.PRNGKey(3), 21, H, W
    )
    target = jax.random.uniform(jax.random.PRNGKey(4), (H, W, 3))

    def loss(m2, cn, lo, col):
        out = rasterize.composite(
            m2, cn, lo, col, depth, valid, H, W, bg=jnp.zeros(3), chunk=8
        )
        return jnp.mean((out.rgb - target) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(mean2d, conic, logo, colors)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(grads[0])).max() > 0
    assert np.abs(np.asarray(grads[2])).max() > 0


def test_composite_grad_matches_finite_difference():
    """Central finite differences on a smooth scalar loss vs autodiff."""
    H = W = 10
    mean2d, conic, logo, colors, depth, valid = random_scene(
        jax.random.PRNGKey(5), 9, H, W, opacity_hi=0.6
    )

    def loss(lo):
        out = rasterize.composite(
            mean2d, conic, lo, colors, depth, valid, H, W, bg=jnp.zeros(3), chunk=4
        )
        return jnp.sum(out.rgb**2)

    g = jax.grad(loss)(logo)
    eps = 1e-3
    for i in [0, 3, 7]:
        lp = logo.at[i].add(eps)
        lm = logo.at[i].add(-eps)
        fd = (loss(lp) - loss(lm)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-4)
