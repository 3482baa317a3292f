"""Tracing / per-phase timing utilities — the TPU equivalents of the
reference's cudaEvent phase timing (bvh_kernels.cu:466-576) and ImGui
ms/frame readout (main.cpp:1614); SURVEY §5 "tracing/profiling".

* `phase_timer()` — wall-clock phase timing with forced device sync
  (block_until_ready on the phase's outputs; plain block can return
  early through the remote-TPU tunnel, so callers should pass the
  arrays they want forced).
* `trace(logdir)` — context manager around jax.profiler for xplane
  traces (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time

from vpt_tpu.utils.logger import VPT_LOG, log


class PhaseTimer:
    """Accumulates named phase durations; print with report()."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, *force):
        """Time a block; pass device arrays as ``force`` to block on
        them (fetches one scalar — see ARCHITECTURE: block_until_ready
        alone is unreliable through the axon tunnel)."""
        t0 = time.time()
        try:
            yield
        finally:
            for a in force:
                try:
                    float(a.ravel()[0])  # force real completion
                except Exception:
                    import jax
                    jax.block_until_ready(a)
            dt = time.time() - t0
            self.times[name] = self.times.get(name, 0.0) + dt

    def report(self):
        total = sum(self.times.values())
        for name, dt in sorted(self.times.items(), key=lambda kv: -kv[1]):
            log(f"phase {name}: {dt*1000:.1f} ms "
                f"({100*dt/max(total,1e-12):.0f}%)", VPT_LOG)
        return dict(self.times)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/vpt_trace"):
    """jax.profiler trace for xplane/TensorBoard inspection."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        log(f"profiler trace written to {logdir}", VPT_LOG)
