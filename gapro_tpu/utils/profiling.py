"""Profiling: jax.profiler traces + named step/op annotations.

The reference has only wall-clock AverageMeters and
``torch.cuda.max_memory_allocated`` logging (ISBNet/tools/train.py:55-99,
isbnet/util/utils.py:151-157).  The TPU-native equivalent is the XLA
profiler: ``trace(dir)`` captures a TensorBoard-loadable trace (HLO
timelines, DMA, MXU occupancy), ``annotate(name)`` scopes host-side
regions, and ``device_memory_stats`` reports live HBM use where the
backend exposes it.

Usage:
    with profiling.trace("runs/x/trace"):      # or train.py --profile
        step(...)
    with profiling.annotate("gp_fit"):
        ...
"""

from __future__ import annotations

import contextlib
import logging

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (TensorBoard format).

    Falls back to a no-op (with a warning) on backends that cannot
    profile — e.g. the remote-relay TPU client.
    """
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # relay backends may not support profiling
        log.warning("jax.profiler unavailable (%s); trace disabled", e)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                log.info("profiler trace written to %s", log_dir)
            except Exception as e:
                log.warning("profiler stop failed: %s", e)


def annotate(name: str):
    """Named scope visible in profiler timelines (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def step_annotation(step: int):
    """Mark a training step (shows step boundaries in the trace viewer)."""
    return jax.profiler.StepTraceAnnotation("train", step_num=step)


def device_memory_stats(device=None) -> dict:
    """Live/peak device memory in bytes ({} if the backend hides it).

    Replaces the reference's ``torch.cuda.max_memory_allocated`` report
    (ISBNet/isbnet/util/utils.py:151-157).
    """
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
    except Exception:
        return {}
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }
