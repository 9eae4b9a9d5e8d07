"""Tracing/profiling spans.

The reference logs manual ``perf_counter`` spans (SURVEY.md §5.1,
predictor.py:594-632 etc.); this keeps those span log fields and adds
optional ``jax.profiler`` trace capture for TPU timeline analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

from lipsync_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class SpanTimer:
    """Collects named wall-clock spans (milliseconds)."""

    def __init__(self):
        self.spans: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1e3
            self.spans[name] = self.spans.get(name, 0.0) + ms

    def log(self, prefix: str = "") -> None:
        parts = " ".join(f"{k}_ms={v:.1f}" for k, v in self.spans.items())
        logger.info("%s%s", prefix, parts)


@contextlib.contextmanager
def tpu_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace when ``log_dir`` is set; no-op
    otherwise (view with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written to %s", log_dir)
