"""jax.profiler integration (SURVEY.md §5 tracing/profiling subsystem).

The reference instruments with wall-clock logging (utils/sfm_utils.py:43-50)
and CUDA events for per-iteration timing (train.py:114-115,140,178,218).
The TPU-native equivalents provided here:

- `profile_trace(logdir)`: wrap any region in a jax.profiler trace —
  produces a TensorBoard/XProf-viewable device+host timeline (the tool
  profile-guided kernel work needs; PERF_NOTES.md front-end roadmap).
- `annotate(name)`: a TraceAnnotation context that labels host-side spans
  inside a trace (the role of torch.cuda.Event pairs).

Both degrade to no-ops with a logged warning when the backend cannot
trace (the axon dev tunnel has no profiler endpoint; production TPU VMs
do), so pipelines can leave profiling flags wired unconditionally.
"""

from __future__ import annotations

import contextlib
import logging

_log = logging.getLogger(__name__)


@contextlib.contextmanager
def profile_trace(logdir, enabled: bool = True):
    """Trace the wrapped region into `logdir` (TensorBoard plugin format).

    Call jax.block_until_ready on the region's outputs INSIDE the region —
    dispatch is async, and an un-synced region records only enqueue time.
    """
    if not enabled or not logdir:
        yield
        return
    import jax

    started = False
    try:
        jax.profiler.start_trace(str(logdir))
        started = True
    except Exception as e:  # backend without profiler support: warn, run on
        _log.warning("jax.profiler trace unavailable (%s); continuing "
                     "without a trace", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                _log.info("profiler trace written to %s", logdir)
            except Exception as e:
                _log.warning("profiler stop_trace failed: %s", e)


def annotate(name: str):
    """Named span inside an active trace (host timeline)."""
    import jax

    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()
