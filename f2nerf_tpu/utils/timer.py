"""Wall-clock tracing (reference src/Utils/StopWatch.{h,cpp}).

StopWatch: interval timer. ScopeWatch: RAII scope timer that synchronizes
the accelerator on entry/exit (the reference calls
torch::cuda::synchronize(); here jax.block_until_ready on a trivial op /
effects fence). Scope timing is gated on F2_PROFILE=1 like the reference's
#ifdef PROFILE (Renderer.cpp:53-55).
"""

from __future__ import annotations

import os
import time


def profiling_enabled() -> bool:
    return os.environ.get("F2_PROFILE", "0") == "1"


def device_sync():
    import jax
    import jax.numpy as jnp
    jax.block_until_ready(jnp.zeros(()) + 0.0)


class StopWatch:
    def __init__(self):
        self.t = time.time()

    def time_duration(self) -> float:
        now = time.time()
        dt = now - self.t
        self.t = now
        return dt


class ScopeWatch:
    """with ScopeWatch('name'): ... — prints elapsed (device-synced) time."""

    def __init__(self, name: str, force: bool = False):
        self.name = name
        self.enabled = force or profiling_enabled()

    def __enter__(self):
        if self.enabled:
            device_sync()
            self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            device_sync()
            print(f"[{self.name}] {time.time() - self.t0:.4f} s", flush=True)
        return False
