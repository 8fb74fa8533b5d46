"""instantsplat_tpu — a TPU-native sparse-view, pose-free 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of NVlabs/InstantSplat
(reference pipeline: MASt3R pointmap init -> global alignment -> joint Gaussian+pose
optimization -> render/eval), built TPU-first:

- the differentiable rasterizer is an MXU-formulated compositor (pixel-monomial x
  Gaussian-feature matmuls) with a Pallas tile kernel on the hot path, instead of a
  CUDA tile rasterizer;
- the geometry-init stack (ViT pointmap model + global aligner) is a jitted JAX graph;
- multi-chip scaling is expressed with jax.sharding.Mesh + pjit/shard_map collectives
  (pixels/tiles sharded, Gaussians replicated, gradients psum'd).

Subpackages:
  utils     core math: quaternions/SE3/sim3, spherical harmonics, LR schedules
  models    parameter pytrees: GaussianModel, cameras, MASt3R/DUSt3R ViT
  ops       compute ops: rasterization (oracle + Pallas), SSIM, KNN, losses
  opt       optimizers (grouped Adam, per-point Adam) and schedules
  init      pointmap inference, pair graph, global alignment (SfM-free init)
  data      image/COLMAP/PLY I/O, train-test splits, co-visibility masks
  render    pose-differentiable render driver
  parallel  device mesh setup + sharding rules
  eval      PSNR/SSIM/LPIPS and ATE/RPE pose metrics
  pipelines end-to-end entry points (init_geo, train, render, metrics)
"""

__version__ = "0.1.0"


def _enable_persistent_compilation_cache():
    """The pipeline's five stages run as separate processes (SURVEY.md §1:
    stage coupling is through the filesystem), so without a persistent
    compilation cache every stage pays full XLA/Mosaic compile time for
    the same programs. Opt into JAX's on-disk cache unless the user
    configured one already."""
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import hashlib
        import jax

        # Key the cache by the host's CPU feature set: XLA:CPU AOT
        # executables compiled on another machine can SIGILL on this one
        # (the cache dir may be on shared/persistent storage).
        try:
            with open("/proc/cpuinfo") as f:
                sig_src = next((l for l in f if l.startswith("flags")), "")
        except OSError:
            sig_src = ""
        sig = hashlib.sha1(sig_src.encode()).hexdigest()[:8]
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", f"instantsplat_tpu_xla_{sig}")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


_enable_persistent_compilation_cache()
