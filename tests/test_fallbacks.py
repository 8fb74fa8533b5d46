"""Fallback paths must be LOUD (VERDICT r1 weakness 6).

- The binned rasterizer's bin-capacity overflow flag must reach the driver,
  warn, and demote to the drop-free dense kernel (the CUDA reference never
  drops splats: diff-gaussian-rasterization sizes per-tile lists exactly).
- The aligner's uneven-edge replicated fallback must log, not silently
  un-shard the mesh.
"""

import logging
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantsplat_tpu.ops import rasterize_pallas_binned
from instantsplat_tpu.render import driver


def _tiny_scene(n=64, h=16, w=32):
    from instantsplat_tpu.models.camera import Camera
    from instantsplat_tpu.models.gaussians import GaussianModel

    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    pts = jax.random.normal(ks[0], (n, 3)) * 0.5 + jnp.array([0.0, 0.0, 3.0])
    cols = jax.random.uniform(ks[1], (n, 3))
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (1, 1))
    g = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses,
                                      max_sh_degree=0)
    cam = Camera.create(np.eye(3), np.zeros(3), fx=40.0, fy=40.0,
                        height=h, width=w, uid=0)
    return g, cam


def test_bin_overflow_flag_trips_on_exhausted_capacity():
    """With cap_factor shrunk below the true pair count the flag is True;
    at the default capacity the same scene is False."""
    n, h, w = 1024, 16, 128
    k = jax.random.PRNGKey(0)
    mean2d = jax.random.uniform(k, (n, 2)) * jnp.array([w, h])
    # large splats: every Gaussian spans all 4 row blocks -> 4N pairs
    conic = jnp.tile(jnp.array([[0.01, 0.0, 0.01]]), (n, 1))
    log_op = jnp.full((n,), jnp.log(0.9))
    valid = jnp.ones((n,), bool)

    assert not bool(rasterize_pallas_binned.bin_overflow(
        mean2d, conic, log_op, valid, height=h, width=w))
    # slot-capacity exhaustion: cap_factor=1 -> cap 2048 < 4096 pairs
    assert bool(rasterize_pallas_binned.bin_overflow(
        mean2d, conic, log_op, valid, height=h, width=w, cap_factor=1))
    # extent-clamp exhaustion: splats span 4 row blocks but d_levels=1
    assert bool(rasterize_pallas_binned.bin_overflow(
        mean2d, conic, log_op, valid, height=h, width=w, d_levels=1))


def test_driver_demotes_binned_backend_on_overflow(monkeypatch, caplog):
    g, cam = _tiny_scene()
    monkeypatch.setattr(driver, "_binned_call_count", {})
    monkeypatch.setattr(driver, "_binned_demoted", set())
    monkeypatch.setattr(
        driver, "_binned_overflow_impl", lambda *a, **k: jnp.asarray(True))

    with caplog.at_level(logging.WARNING, logger=driver.__name__):
        out = driver.render(g, cam, backend="pallas-binned")
    assert any("auto-switching" in r.message for r in caplog.records)

    # demoted path == dense pallas path, and the demotion sticks (the next
    # call must not re-run the overflow probe)
    ref = driver.render(g, cam, backend="pallas")
    np.testing.assert_allclose(np.asarray(out.render),
                               np.asarray(ref.render), atol=1e-6)
    monkeypatch.setattr(
        driver, "_binned_overflow_impl",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("re-probed")))
    out2 = driver.render(g, cam, backend="pallas-binned")
    np.testing.assert_allclose(np.asarray(out2.render),
                               np.asarray(ref.render), atol=1e-6)


def test_driver_keeps_binned_backend_without_overflow(monkeypatch):
    g, cam = _tiny_scene()
    monkeypatch.setattr(driver, "_binned_call_count", {})
    monkeypatch.setattr(driver, "_binned_demoted", set())
    out = driver.render(g, cam, backend="pallas-binned")
    ref = driver.render(g, cam, backend="oracle")
    np.testing.assert_allclose(np.asarray(out.render),
                               np.asarray(ref.render), atol=2e-5)


def test_driver_capped_binned_caps_reach_probe(monkeypatch):
    """Capacity-suffixed backend strings ("pallas-binned:CF:DL") also get
    the rate-limited overflow probe (auto-sized caps go stale as scene
    content drifts), and the explicit capacities reach the probe."""
    g, cam = _tiny_scene()
    monkeypatch.setattr(driver, "_binned_call_count", {})
    monkeypatch.setattr(driver, "_binned_demoted", set())
    seen = {}
    real = driver._binned_overflow_impl

    def spy(*a, **k):
        seen.update(k)
        return real(*a, **k)

    monkeypatch.setattr(driver, "_binned_overflow_impl", spy)
    out = driver.render(g, cam, backend="pallas-binned:6:8")
    assert seen.get("cf") == 6 and seen.get("dl") == 8
    ref = driver.render(g, cam, backend="oracle")
    np.testing.assert_allclose(np.asarray(out.render),
                               np.asarray(ref.render), atol=2e-5)


def test_aligner_uneven_edges_logs_replicated_fallback(caplog):
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_aligner import _synthetic_scene

    from instantsplat_tpu.init import GlobalAligner
    from instantsplat_tpu.parallel import make_mesh

    # 6 edges % 4 != 0 AND area 23*31=713 % 4 != 0: neither sharding axis
    # divides -> replicated fallback (a divisible area would shard by area
    # instead; see test_parallel.test_aligner_area_sharded_matches_single)
    _, _, preds = _synthetic_scene(n_views=3, h=23, w=31)
    al = GlobalAligner(preds)
    al.init_mst(focal_avg=True)
    mesh = make_mesh(4)
    with caplog.at_level(logging.WARNING,
                         logger="instantsplat_tpu.init.aligner"):
        al.align(niter=2, mesh=mesh)
    assert any("running replicated" in r.message for r in caplog.records)


def test_binned_backend_usable_under_outer_jit():
    """render(backend='pallas-binned') must stay traceable: the host-side
    overflow probe cannot run on tracers (the trainer jits around render),
    so under trace the binned path is kept as-is."""
    g, cam = _tiny_scene()

    @jax.jit
    def f(p):
        out = driver.render(g, cam, pose=p, backend="pallas-binned")
        return jnp.mean(out.render)

    v = f(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0]))
    assert np.isfinite(float(v))
