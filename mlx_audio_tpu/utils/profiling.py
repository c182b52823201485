"""Profiling / tracing hooks (SURVEY.md §5: the reference has no tracer and
reports only inline per-segment metrics, kokoro.py:305-343; the TPU build
keeps that metrics schema and adds real XLA traces).

``trace(logdir)`` captures a TensorBoard/Perfetto-compatible XLA trace of
everything executed inside the block; ``annotate(name)`` marks host-side
phases so they show up on the trace timeline.  Both are no-ops when the
profiler is unavailable (e.g. restricted runtimes).
"""

from __future__ import annotations

import contextlib
import logging
from typing import Iterator, Optional

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``logdir`` (view with TensorBoard's
    profile plugin or Perfetto).  ``logdir=None`` disables tracing."""
    if not logdir:
        yield
        return
    import jax

    try:
        ctx = jax.profiler.trace(logdir)
        ctx.__enter__()
    except Exception as e:  # pragma: no cover - runtime-dependent
        log.warning("profiler trace unavailable: %s", e)
        yield
        return
    try:
        yield
    finally:
        try:
            ctx.__exit__(None, None, None)
            log.info("XLA trace written to %s", logdir)
        except Exception as e:  # pragma: no cover
            log.warning("profiler trace failed to finalize: %s", e)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named host-span annotation on the profiler timeline."""
    import jax

    try:
        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover
        ctx = contextlib.nullcontext()
    with ctx:
        yield
