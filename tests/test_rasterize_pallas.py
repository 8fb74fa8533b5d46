"""Pallas tile rasterizer vs the pure-jnp oracle: forward images and VJPs.

Runs the kernels in interpret mode on the CPU test backend; the identical
code path compiles on TPU. Tolerances are tight (same math, different
summation order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantsplat_tpu.ops import rasterize, rasterize_pallas


def _random_splats(key, n, height, width, depth_range=(1.0, 8.0)):
    ks = jax.random.split(key, 6)
    mean2d = jax.random.uniform(
        ks[0], (n, 2), minval=-10.0, maxval=0.0
    ) + jax.random.uniform(ks[1], (n, 2)) * jnp.array(
        [width + 20.0, height + 20.0]
    )
    # random SPD conics with a spread of scales
    s = jax.random.uniform(ks[2], (n, 2), minval=0.02, maxval=0.8)
    theta = jax.random.uniform(ks[3], (n,), maxval=np.pi)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    a = s[:, 0] * ct**2 + s[:, 1] * st**2
    c = s[:, 0] * st**2 + s[:, 1] * ct**2
    b = (s[:, 0] - s[:, 1]) * ct * st
    conic = jnp.stack([a, b, c], -1)
    log_op = jnp.log(jax.random.uniform(ks[4], (n,), minval=0.2, maxval=0.95))
    colors = jax.random.uniform(ks[5], (n, 3))
    depth = jnp.linspace(*depth_range, n)  # already sorted front-to-back
    valid = jnp.ones((n,), bool).at[::7].set(False)  # some culled entries
    return mean2d, conic, log_op, colors, depth, valid


@pytest.mark.parametrize("n,height,width", [(300, 24, 40), (520, 36, 130)])
def test_forward_matches_oracle(n, height, width):
    splats = _random_splats(jax.random.PRNGKey(0), n, height, width)
    bg = jnp.array([0.1, 0.5, 0.9])
    ours = rasterize_pallas.composite_tiles(
        *splats, height=height, width=width, bg=bg
    )
    ref = rasterize.composite(*splats, height=height, width=width, bg=bg)
    np.testing.assert_allclose(ours.rgb, ref.rgb, atol=2e-5)
    np.testing.assert_allclose(ours.alpha, ref.alpha, atol=2e-5)
    np.testing.assert_allclose(ours.depth, ref.depth, atol=2e-4)


def test_vjp_matches_oracle():
    height, width = 20, 36
    splats = _random_splats(jax.random.PRNGKey(3), 260, height, width)
    bg = jnp.array([0.3, 0.2, 0.1])
    kg = jax.random.split(jax.random.PRNGKey(7), 3)
    g_rgb = jax.random.normal(kg[0], (height, width, 3))
    g_alpha = jax.random.normal(kg[1], (height, width))
    g_depth = jax.random.normal(kg[2], (height, width))

    def loss(fn, m2, cn, lo, col, dep, b):
        out = fn(m2, cn, lo, col, dep, splats[5], height=height, width=width,
                 bg=b)
        return (
            jnp.sum(out.rgb * g_rgb)
            + jnp.sum(out.alpha * g_alpha)
            + jnp.sum(out.depth * g_depth)
        )

    args = (*splats[:5], bg)
    ours = jax.grad(
        lambda *a: loss(rasterize_pallas.composite_tiles, *a),
        argnums=tuple(range(6)),
    )(*args)
    ref = jax.grad(
        lambda *a: loss(rasterize.composite, *a), argnums=tuple(range(6))
    )(*args)
    names = ["mean2d", "conic", "log_op", "colors", "depth", "bg"]
    for name, o, r in zip(names, ours, ref):
        scale = np.maximum(np.abs(np.asarray(r)).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(o) / scale, np.asarray(r) / scale, atol=5e-5,
            err_msg=f"grad mismatch: {name}",
        )


def test_multi_strip_consistency():
    """Strip decomposition (H > STRIP_ROWS) must not change the image."""
    import instantsplat_tpu.ops.rasterize_pallas as rp

    height, width = 16, 24
    splats = _random_splats(jax.random.PRNGKey(5), 150, height, width)
    full = rp.composite_tiles(*splats, height=height, width=width)
    old = rp.STRIP_ROWS
    try:
        rp.STRIP_ROWS = 8  # force 2 strips
        stripped = rp.composite_tiles(*splats, height=height, width=width)
    finally:
        rp.STRIP_ROWS = old
    np.testing.assert_allclose(stripped.rgb, full.rgb, atol=1e-5)
    np.testing.assert_allclose(stripped.alpha, full.alpha, atol=1e-5)


def test_packed_forward_and_vjp_match_oracle():
    """composite_tiles_packed == oracle on both the image and the packed-array
    gradient (the production driver path feeds the kernel this layout)."""
    height, width = 20, 36
    splats = _random_splats(jax.random.PRNGKey(11), 260, height, width)
    m2, cn, lo, col, dep, val = splats
    bg = jnp.array([0.2, 0.4, 0.6])
    packed = rasterize_pallas.pack_splats(m2, cn, lo, col, dep, val)

    ours = rasterize_pallas.composite_tiles_packed(
        packed, height=height, width=width, bg=bg)
    ref = rasterize.composite(*splats, height=height, width=width, bg=bg)
    np.testing.assert_allclose(ours.rgb, ref.rgb, atol=2e-5)
    np.testing.assert_allclose(ours.alpha, ref.alpha, atol=2e-5)

    kg = jax.random.split(jax.random.PRNGKey(13), 2)
    g_rgb = jax.random.normal(kg[0], (height, width, 3))
    g_alpha = jax.random.normal(kg[1], (height, width))

    def loss_packed(p):
        out = rasterize_pallas.composite_tiles_packed(
            p, height=height, width=width, bg=bg)
        return jnp.sum(out.rgb * g_rgb) + jnp.sum(out.alpha * g_alpha)

    def loss_oracle(m2_, cn_, lo_, col_, dep_):
        out = rasterize.composite(m2_, cn_, lo_, col_, dep_, val,
                                  height=height, width=width, bg=bg)
        return jnp.sum(out.rgb * g_rgb) + jnp.sum(out.alpha * g_alpha)

    gp = jax.grad(loss_packed)(packed)
    ref_g = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(m2, cn, lo, col, dep)
    # packed columns: 0:2 mean2d, 2:5 conic, 5 log_op (valid rows), 6:9 color,
    # 9 depth
    valid_np = np.asarray(val)
    slices = [gp[:, 0:2], gp[:, 2:5], gp[:, 5], gp[:, 6:9], gp[:, 9]]
    for name, o, r in zip(["mean2d", "conic", "log_op", "colors", "depth"],
                          slices, ref_g):
        o, r = np.asarray(o), np.asarray(r)
        scale = max(np.abs(r).max(), 1e-3)
        np.testing.assert_allclose(
            (o / scale)[valid_np], (r / scale)[valid_np], atol=5e-5,
            err_msg=f"packed grad mismatch: {name}")


# ---------------------------------------------------------------------------
# binned (v2) rasterizer — same harness, same oracle
# ---------------------------------------------------------------------------

from instantsplat_tpu.ops import rasterize_pallas_binned as rpb  # noqa: E402


@pytest.mark.parametrize("n,height,width", [(300, 24, 40), (520, 36, 130)])
def test_binned_forward_matches_oracle(n, height, width):
    splats = _random_splats(jax.random.PRNGKey(0), n, height, width)
    bg = jnp.array([0.1, 0.5, 0.9])
    ours = rpb.composite_tiles_binned(
        *splats, height=height, width=width, bg=bg
    )
    ref = rasterize.composite(*splats, height=height, width=width, bg=bg)
    np.testing.assert_allclose(ours.rgb, ref.rgb, atol=2e-5)
    np.testing.assert_allclose(ours.alpha, ref.alpha, atol=2e-5)
    np.testing.assert_allclose(ours.depth, ref.depth, atol=2e-4)


def test_binned_vjp_matches_oracle():
    height, width = 20, 36
    splats = _random_splats(jax.random.PRNGKey(3), 260, height, width)
    bg = jnp.array([0.3, 0.2, 0.1])
    kg = jax.random.split(jax.random.PRNGKey(7), 3)
    g_rgb = jax.random.normal(kg[0], (height, width, 3))
    g_alpha = jax.random.normal(kg[1], (height, width))
    g_depth = jax.random.normal(kg[2], (height, width))

    def loss(fn, m2, cn, lo, col, dep, b):
        out = fn(m2, cn, lo, col, dep, splats[5], height=height, width=width,
                 bg=b)
        return (
            jnp.sum(out.rgb * g_rgb)
            + jnp.sum(out.alpha * g_alpha)
            + jnp.sum(out.depth * g_depth)
        )

    args = (*splats[:5], bg)
    ours = jax.grad(
        lambda *a: loss(rpb.composite_tiles_binned, *a),
        argnums=tuple(range(6)),
    )(*args)
    ref = jax.grad(
        lambda *a: loss(rasterize.composite, *a), argnums=tuple(range(6))
    )(*args)
    names = ["mean2d", "conic", "log_op", "colors", "depth", "bg"]
    for name, o, r in zip(names, ours, ref):
        scale = np.maximum(np.abs(np.asarray(r)).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(o) / scale, np.asarray(r) / scale, atol=5e-5,
            err_msg=f"binned grad mismatch: {name}",
        )


def test_binned_overflow_dump_slot():
    """With a tiny capacity, overflow pairs drop without crashing and the
    image remains finite (documented degradation mode)."""
    height, width = 16, 24
    splats = _random_splats(jax.random.PRNGKey(9), 200, height, width)
    out = rpb.composite_tiles_binned(
        *splats, height=height, width=width, cap_factor=1)
    assert np.isfinite(np.asarray(out.rgb)).all()


def test_bin_requirements_sizes_dropfree_caps():
    """bin_requirements returns (cap_factor, d_levels) that make the
    binned kernel drop-free — exact vs the oracle — on a scene that
    OVERFLOWS the default capacity (near-uniform depth: every splat's
    row-block run lands in the same few bins)."""
    import numpy as np

    from instantsplat_tpu.ops import rasterize, rasterize_pallas_binned as rb

    rng = np.random.default_rng(0)
    n, h, w = 4096, 32, 128
    # all splats on a thin depth slab, spread over the image, big enough
    # to span several row blocks each -> sum(extents) >> CAP_FACTOR * N
    mean2d = jnp.asarray(
        rng.uniform([0, 0], [w, h], (n, 2)).astype(np.float32))
    conic = jnp.tile(jnp.asarray([[0.02, 0.0, 0.02]], jnp.float32), (n, 1))
    log_op = jnp.full((n,), jnp.log(0.5))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    depth = jnp.asarray(
        (3.0 + 1e-4 * rng.random(n)).astype(np.float32))
    valid = jnp.ones((n,), bool)

    assert bool(rb.bin_overflow(mean2d, conic, log_op, valid,
                                height=h, width=w))
    cf, dl = rb.bin_requirements(mean2d, conic, log_op, valid, h, w)
    assert not bool(rb.bin_overflow(mean2d, conic, log_op, valid,
                                    height=h, width=w,
                                    cap_factor=cf, d_levels=dl))
    got = rb.composite_tiles_binned(
        mean2d, conic, log_op, colors, depth, valid, height=h, width=w,
        cap_factor=cf, d_levels=dl)
    ref = rasterize.composite(mean2d, conic, log_op, colors, depth, valid,
                              height=h, width=w, chunk=512)
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(ref.rgb),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.alpha),
                               np.asarray(ref.alpha), atol=2e-5)


def test_binned_view_requirements_scale_modifier():
    """driver.binned_view_requirements (the sizing trainer/render-pipeline
    auto-selection uses) matches bin_requirements on the same splats, and a
    larger scale_modifier grows the required capacities (ADVICE r3: the
    probe must honor the render's scale)."""
    import numpy as np

    from instantsplat_tpu.models.camera import Camera
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.ops import rasterize_pallas_binned as rb
    from instantsplat_tpu.render import driver

    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    pts = jax.random.normal(ks[0], (2048, 3)) * jnp.asarray([2.0, 0.2, 0.01]) \
        + jnp.asarray([0.0, 0.0, 3.0])
    cols = jax.random.uniform(ks[1], (2048, 3))
    poses = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0]), (1, 1))
    g = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses,
                                      max_sh_degree=0)
    cam = Camera.create(np.eye(3), np.zeros(3), fx=60.0, fy=60.0,
                        height=32, width=128, uid=0)

    cf1, dl1 = driver.binned_view_requirements(g, g.get_pose(0), cam)
    (m2, cn, lo, _, _, va), _ = driver.prepare_sorted_splats(
        g, g.get_pose(0), cam.fx, cam.fy, cam.cx, cam.cy,
        jnp.float32(1.0), 0, cam.height, cam.width)
    cf_ref, dl_ref = rb.bin_requirements(m2, cn, lo, va, cam.height,
                                         cam.width)
    assert (cf1, dl1) == (cf_ref, dl_ref)

    cf8, dl8 = driver.binned_view_requirements(g, g.get_pose(0), cam,
                                               scale_modifier=8.0)
    assert cf8 >= cf1 and dl8 >= dl1
    assert cf8 > cf1 or dl8 > dl1  # 8x splats must need more somewhere


def test_packed_multi_strip_single_dispatch_fwd_bwd():
    """The packed path's (n_strips, n_chunks) grid (one forward dispatch
    for any image height — rasterize_pallas._multi_fwd_call) matches the
    oracle on image AND gradients when the height spans several strips."""
    import instantsplat_tpu.ops.rasterize_pallas as rp
    from instantsplat_tpu.ops import rasterize

    height, width = 40, 36
    splats = _random_splats(jax.random.PRNGKey(21), 300, height, width)
    packed = rp.pack_splats(*splats)
    old = rp.STRIP_ROWS
    try:
        rp.STRIP_ROWS = 12  # force 4 strips of 12 rows (h_pad 40 -> 4x12)
        w_pad, n_strips, strip_rows = rp._image_strip_layout(height, width)
        assert n_strips > 2

        def f(pk):
            out = rp.composite_tiles_packed(pk, height=height, width=width)
            return jnp.sum(out.rgb * 0.3 + out.alpha[..., None] * 0.1), out

        (val, out), grad = jax.value_and_grad(f, has_aux=True)(packed)
    finally:
        rp.STRIP_ROWS = old

    ref = rasterize.composite(*splats, height=height, width=width)

    def f_ref(m2, cn, lo, col, dep):
        o = rasterize.composite(m2, cn, lo, col, dep, splats[5],
                                height=height, width=width)
        return jnp.sum(o.rgb * 0.3 + o.alpha[..., None] * 0.1)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(*splats[:5])
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad[:, 0:2]),
                               np.asarray(g_ref[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(grad[:, 5]),
                               np.asarray(g_ref[2]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(grad[:, 6:9]),
                               np.asarray(g_ref[3]), atol=2e-4)


# ---------------------------------------------------------------------------
# 2-D tiled (v3) rasterizer — same harness, same oracle
# ---------------------------------------------------------------------------

from instantsplat_tpu.ops import rasterize_pallas_tiled as rpt  # noqa: E402


def _tiled_caps(splats, height, width):
    m2, cn, lo, _, _, vd = splats
    return rpt.tile_requirements(m2, cn, lo, vd, height, width)


@pytest.mark.parametrize("n,height,width",
                         [(300, 24, 40), (520, 36, 130), (150, 300, 260)])
def test_tiled_forward_matches_oracle(n, height, width):
    splats = _random_splats(jax.random.PRNGKey(0), n, height, width)
    cf, dy, dx = _tiled_caps(splats, height, width)
    bg = jnp.array([0.1, 0.5, 0.9])
    ours = rpt.composite_tiles_2d(
        *splats, height=height, width=width, bg=bg,
        cap_factor=cf, dy_levels=dy, dx_levels=dx)
    assert not bool(rpt.tile_overflow(
        splats[0], splats[1], splats[2], splats[5], height, width,
        cap_factor=cf, dy_levels=dy, dx_levels=dx))
    ref = rasterize.composite(*splats, height=height, width=width, bg=bg)
    np.testing.assert_allclose(ours.rgb, ref.rgb, atol=2e-5)
    np.testing.assert_allclose(ours.alpha, ref.alpha, atol=2e-5)
    np.testing.assert_allclose(ours.depth, ref.depth, atol=2e-4)


def test_tiled_vjp_matches_oracle():
    height, width = 20, 150  # two column buckets
    splats = _random_splats(jax.random.PRNGKey(3), 260, height, width)
    cf, dy, dx = _tiled_caps(splats, height, width)
    bg = jnp.array([0.3, 0.2, 0.1])
    kg = jax.random.split(jax.random.PRNGKey(7), 3)
    g_rgb = jax.random.normal(kg[0], (height, width, 3))
    g_alpha = jax.random.normal(kg[1], (height, width))
    g_depth = jax.random.normal(kg[2], (height, width))

    def loss(fn, m2, cn, lo, col, dep, b, **kw):
        out = fn(m2, cn, lo, col, dep, splats[5], height=height,
                 width=width, bg=b, **kw)
        return (
            jnp.sum(out.rgb * g_rgb)
            + jnp.sum(out.alpha * g_alpha)
            + jnp.sum(out.depth * g_depth)
        )

    args = (*splats[:5], bg)
    ours = jax.grad(
        lambda *a: loss(rpt.composite_tiles_2d, *a, cap_factor=cf,
                        dy_levels=dy, dx_levels=dx),
        argnums=tuple(range(6)),
    )(*args)
    ref = jax.grad(
        lambda *a: loss(rasterize.composite, *a), argnums=tuple(range(6))
    )(*args)
    names = ["mean2d", "conic", "log_op", "colors", "depth", "bg"]
    for name, o, r in zip(names, ours, ref):
        scale = np.maximum(np.abs(np.asarray(r)).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(o) / scale, np.asarray(r) / scale, atol=5e-5,
            err_msg=f"tiled grad mismatch: {name}",
        )


def test_tiled_overflow_dump_slot():
    """With a tiny capacity, overflow pairs drop without crashing, the
    flag reports it, and the image stays finite (documented degradation
    mode, same contract as the 1-D binned kernel)."""
    height, width = 32, 24
    splats = _random_splats(jax.random.PRNGKey(9), 200, height, width)
    out = rpt.composite_tiles_2d(
        *splats, height=height, width=width, cap_factor=1, dy_levels=1,
        dx_levels=1)
    assert np.isfinite(np.asarray(out.rgb)).all()
    assert bool(rpt.tile_overflow(
        splats[0], splats[1], splats[2], splats[5], height, width,
        cap_factor=1, dy_levels=1, dx_levels=1))


def test_tiled_empty_tiles_background():
    """Tiles no splat touches must come out as pure background
    (untouched kernel outputs are filled host-side from the construction
    counts — uninitialized memory must never leak into the image)."""
    height, width = 64, 300  # 3 column buckets, 8 row blocks
    n = 40
    k = jax.random.PRNGKey(11)
    # all splats confined to the top-left tile
    mean2d = jax.random.uniform(k, (n, 2), minval=5.0, maxval=20.0)
    conic = jnp.tile(jnp.array([[0.5, 0.0, 0.5]]), (n, 1))
    log_op = jnp.full((n,), jnp.log(0.9))
    colors = jnp.ones((n, 3)) * 0.7
    depth = jnp.linspace(1.0, 2.0, n)
    valid = jnp.ones((n,), bool)
    bg = jnp.array([0.25, 0.5, 0.75])
    out = rpt.composite_tiles_2d(
        mean2d, conic, log_op, colors, depth, valid,
        height=height, width=width, bg=bg)
    img = np.asarray(out.rgb)
    assert np.allclose(img[40:, 200:], np.asarray(bg), atol=1e-6)
    assert np.asarray(out.alpha)[40:, 200:].max() == 0.0
    assert img[5:20, 5:20].mean() > 0.4  # splats actually rendered


def test_tiled_key_space_guard():
    """Shapes whose tile x splat key space exceeds int32 raise (callers
    fall back to the 1-D binned or dense kernel)."""
    n = 2_000_000
    with pytest.raises(ValueError, match="key space"):
        # fabricate tiny arrays but monkeypatch is overkill: n_tiles for
        # 8k x 8k at 8x128 tiles = 64k; 64k * 40k splats overflows
        m2 = jnp.zeros((40_000, 2))
        rpt.composite_tiles_2d(
            m2, jnp.zeros((40_000, 3)), jnp.zeros(40_000),
            jnp.zeros((40_000, 3)), jnp.zeros(40_000),
            jnp.ones(40_000, bool), height=8192, width=8192)
