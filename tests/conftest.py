"""Test environment: hermetic CPU backend with 8 virtual devices.

Multi-chip sharding (instantsplat_tpu.parallel) is exercised on a fake
8-device CPU mesh — the standard JAX pattern for testing pjit/shard_map
without a pod. Must run before jax initializes, hence env mutation at
module import time.
"""

import os
import sys

# Force CPU: the shell env pre-sets JAX_PLATFORMS=axon (remote TPU tunnel),
# which is far too slow for unit tests — a plain setdefault would not override it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The package enables a persistent compilation cache shared across processes.
# XLA:CPU stores host-AOT executables in it; replaying one compiled on a
# different machine logs SIGILL warnings (cpu_aot_loader) and can crash. Key
# the test cache by the host's CPU feature set so cross-machine reuse never
# happens (same host => still warm between test runs).
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            _sig_src = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        _sig_src = ""
    _sig = hashlib.sha1(_sig_src.encode()).hexdigest()[:8]
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.expanduser("~"), ".cache", f"instantsplat_tpu_xla_cpu_{_sig}")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The machine image's sitecustomize registers a remote-TPU ("axon") PJRT
# backend and force-sets jax.config jax_platforms="axon,cpu", which would make
# every unit test dispatch over the TPU tunnel. Re-pin the config to CPU here
# (config takes precedence over the env var, so the env var alone is not
# enough).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
