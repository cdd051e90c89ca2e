"""Tracing / profiling / FLOPs accounting.

The reference has no profiler beyond wall-clock AverageMeters and
commented-out ptflops probes (``tools/runner_module.py:77-79,95-96``,
SURVEY.md §5). TPU-native replacement:

* ``annotate(name)``      — jax.profiler TraceAnnotation context for the
  pipeline phases (crop / rectify / completion / downstream).
* ``maybe_trace(dir)``    — whole-program profiler trace (XPlane, viewable in
  TensorBoard / xprof), enabled via the UPP_PROFILE_DIR env var.
* ``cost_analysis(fn, *args)`` — XLA-reported FLOPs/bytes for a jitted fn,
  the ptflops replacement.
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Dict, Optional

import jax


def annotate(name: str):
    """Named trace region (shows up in the xprof timeline)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str] = None):
    """Profile the enclosed block when a directory is given (or via the
    UPP_PROFILE_DIR environment variable)."""
    trace_dir = trace_dir or os.environ.get("UPP_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


def cost_analysis(fn, *args, **kwargs) -> Dict[str, Any]:
    """XLA cost analysis of a jitted function: FLOPs, bytes accessed, and
    derived arithmetic intensity (the ptflops replacement —
    ``runner_module.py:77-79``)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns per-device list
        costs = costs[0]
    flops = float(costs.get("flops", 0.0))
    bytes_accessed = float(costs.get("bytes accessed", 0.0))
    return {
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "arithmetic_intensity": flops / bytes_accessed if bytes_accessed else 0.0,
        "raw": dict(costs),
    }
