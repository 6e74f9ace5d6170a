"""Profiling: wall-clock taxonomy plus native device traces.

The reference's only profiling is ``time.time()`` spans accumulated in
``measured_time`` (``LearnedIndex.py:85-159``) and the ``log_runtime``
decorator; the TPU-native equivalent adds ``jax.profiler`` traces
(viewable in TensorBoard / Perfetto) around any region.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def device_trace(log_dir: str):
    """Capture a device profile for the enclosed region::

        with device_trace("/tmp/lmi-trace"):
            index.search(...)

    Open the directory with TensorBoard's profile plugin or upload the
    ``.trace.json.gz`` to Perfetto.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Name a region inside a captured trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
