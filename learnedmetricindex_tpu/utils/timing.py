"""Wall-clock timing helpers.

The reference accumulates ``time.time()`` spans into a ``measured_time``
defaultdict with keys ``inference``, ``search``, ``search_within_buckets``,
``seq_search``, ``sort`` (``search/li/LearnedIndex.py:85-159``).  We keep
the same timing taxonomy so result schemas stay comparable, but measure
with ``perf_counter`` and block on device results so that async dispatch
does not hide device time.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

import jax


class Timer:
    """Accumulates named wall-clock spans (device-synchronized)."""

    def __init__(self) -> None:
        self.measured: Dict[str, float] = defaultdict(float)

    @contextmanager
    def span(self, name: str, block_on=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.measured[name] += time.perf_counter() - start

    def add(self, name: str, seconds: float) -> None:
        self.measured[name] += seconds

    def as_dict(self) -> Dict[str, float]:
        return dict(self.measured)


def block(tree):
    """Block until every array in ``tree`` is ready, then return it."""
    return jax.block_until_ready(tree)
