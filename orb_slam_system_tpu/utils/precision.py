"""Full-f32 matmul precision for the geometry solvers.

On TPU, f32 matmuls run as bf16 passes at the DEFAULT precision — fine for
descriptor scoring (explicitly bf16 by design), but the solvers' normal
equations (J^T W J, J^T W e), Schur products, and DLT SVD inputs lose ~8
mantissa bits vs the CPU backend, which measurably degrades tracking
margins on hard segments (the long loop demo diverged between backends).
Applied per-solver as a trace-time context so it cannot leak into Pallas
kernels (a global jax_default_matmul_precision breaks the bf16 descriptor
kernel's lowering).
"""

from __future__ import annotations

import functools

import jax


def f32_solver(fn):
    """Decorator: trace `fn` under full-float32 matmul precision."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped
