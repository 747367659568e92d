"""Tracing / profiling hooks (aux subsystem, SURVEY.md §5).

Thin wrappers over ``jax.profiler`` and ``jax.named_scope`` so every hot op
shows up as a named region in XProf/Perfetto traces. The reference's only
"tracing" is leftover ``dbg!`` prints (`csr/ops/add.rs:14`); this is the
real thing.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

__all__ = ["annotate", "trace_to", "device_sync"]


def annotate(name: str):
    """Named-scope context for compiled regions (shows in XLA traces)."""
    return jax.named_scope(name)


@contextmanager
def trace_to(logdir: str):
    """Capture a profiler trace (XProf/Perfetto) around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(tree) -> None:
    """Block until every array in a pytree is ready (for timing hygiene)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
