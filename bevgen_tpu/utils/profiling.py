"""Profiling & debug instrumentation.

Reference: scripts/inference.py:106-141 (torch.profiler chrome traces +
hand-rolled timing / peak memory) and the `debug=profile` config mode.
TPU-native: jax.profiler traces viewable in TensorBoard/Perfetto,
device memory stats, NaN checking via jax config.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "output/trace"):
    """jax.profiler trace context (replaces torch.profiler chrome
    export, scripts/inference.py:123-141)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, float]:
    """Peak/current HBM usage in MB (torch.cuda.max_memory_allocated
    equivalent)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    mb = 1024 * 1024
    return {
        "bytes_in_use_mb": stats.get("bytes_in_use", 0) / mb,
        "peak_bytes_in_use_mb": stats.get("peak_bytes_in_use", 0) / mb,
        "bytes_limit_mb": stats.get("bytes_limit", 0) / mb,
    }


def benchmark(fn: Callable, *args, reps: int = 5, warmup: int = 2,
              sync: Optional[Callable] = None) -> Dict[str, float]:
    """Timed benchmark with host-materialization sync (block_until_ready
    is unreliable on the tunneled axon platform — see repo verify
    skill)."""
    def _sync(out):
        if sync is not None:
            return sync(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf).ravel()[:1]
        return out

    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return {"best_ms": min(times) * 1e3,
            "mean_ms": float(np.mean(times)) * 1e3,
            **device_memory_stats()}


def enable_nan_checks():
    """debug_nans mode (replaces the reference's in-model NaN asserts,
    mingpt_sparse.py:383,388)."""
    jax.config.update("jax_debug_nans", True)
