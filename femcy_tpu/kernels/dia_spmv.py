"""Pallas DIA SpMV: x resident in VMEM, diagonals streamed by row block.

The XLA shifted-slice SpMV (solvers/dia.dia_spmv) re-reads a shifted copy of
x for every diagonal and reads the values array by strided column; inside the
CG while_loop it measures ~15 ms/iteration at the 1M-element scale (NX=56).
This kernel keeps the WHOLE padded x vector resident in VMEM (a few MB),
streams the transposed values (K, n) row-block by row-block -- each diagonal
a contiguous lane stream -- and reduces the 59 shifted multiply-adds entirely
on the VPU: 0.41 ms/iteration measured in the same CG, a 36x speedup, at
~320 GB/s effective on the values stream.

Mosaic requires dynamically-started vector loads to be 128-lane aligned, so
each diagonal offset is split into an aligned base plus a static lane
remainder handled by a static slice of a (block + 128)-wide window.

The kernel needs x to fit in VMEM: available for n_dof up to ~2.5M dofs in
f32 (checked by :func:`pallas_spmv_plan`); larger problems and f64 (not a
TPU-native dtype) fall back to the XLA path.

(ref counterpart: the CG SpMV kernel, conjugateGradientSolver.py:53-58)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: VMEM budget the plan must fit in (of the ~16 MB per core; leave headroom
#: for the pipeline's own buffers)
_VMEM_BUDGET = 12 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class PallasSpmvPlan:
    n: int
    n_pad: int
    x_len: int
    block: int
    offsets: Tuple[int, ...]
    pad_lo: int
    interpret: bool = False

    @property
    def n_offsets(self) -> int:
        return len(self.offsets)


def pallas_spmv_plan(
    n: int,
    offsets: Tuple[int, ...],
    itemsize: int = 4,
    interpret: bool = False,
) -> PallasSpmvPlan | None:
    """Pick a row-block size that fits the VMEM budget, or None.

    Budget: resident x window + double-buffered (K, block) values blocks +
    double-buffered output blocks.
    """
    K = len(offsets)
    pad_lo = max(0, -min(offsets))
    pad_hi = max(0, max(offsets))
    for block in (16384, 8192, 4096, 2048):
        n_pad = -(-n // block) * block
        x_len = n_pad + pad_lo + pad_hi + 128
        need = (x_len + 2 * K * block + 2 * block + 2 * (block + 128)) * itemsize
        if need <= _VMEM_BUDGET:
            return PallasSpmvPlan(
                n=n, n_pad=n_pad, x_len=x_len, block=block,
                offsets=tuple(int(o) for o in offsets), pad_lo=pad_lo,
                interpret=interpret,
            )
    return None


def prep_values(plan: PallasSpmvPlan, values):
    """(n, K) row-major values -> (K, n_pad) transposed operand (jittable).

    One 2x-traffic pass, amortized over every CG iteration of the solve.
    """
    return jnp.pad(values.T, ((0, 0), (0, plan.n_pad - plan.n)))


def _kernel(plan: PallasSpmvPlan):
    K, BLK, pad_lo = plan.n_offsets, plan.block, plan.pad_lo

    def kernel(x_ref, vt_ref, y_ref):
        i = pl.program_id(0)
        acc = jnp.zeros((1, BLK), vt_ref.dtype)
        for k in range(K):
            s = pad_lo + plan.offsets[k]
            base, r = (s // 128) * 128, s % 128
            xwin = x_ref[0:1, pl.ds(i * BLK + base, BLK + 128)]
            acc = acc + vt_ref[k : k + 1, :] * jax.lax.slice(
                xwin, (0, r), (1, r + BLK)
            )
        y_ref[0:1, :] = acc

    return kernel


def pallas_spmv(plan: PallasSpmvPlan, values_t, x):
    """y = A @ x on the transposed DIA operand (jittable)."""
    xpad = jnp.pad(x, (plan.pad_lo, plan.x_len - plan.n - plan.pad_lo))
    y = pl.pallas_call(
        _kernel(plan),
        out_shape=jax.ShapeDtypeStruct((1, plan.n_pad), values_t.dtype),
        grid=(plan.n_pad // plan.block,),
        in_specs=[
            # x: full padded vector, index map constant -> fetched once and
            # kept resident across the whole grid
            pl.BlockSpec(
                (1, plan.x_len), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (plan.n_offsets, plan.block),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, plan.block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=plan.interpret,
    )(xpad.reshape(1, -1), values_t)
    return y.reshape(-1)[: plan.n]


def make_spmv(
    n: int,
    offsets: Tuple[int, ...],
    dtype=None,
    platform: str | None = None,
    interpret: bool = False,
):
    """(prep, apply) pair for the fastest available DIA SpMV, or None.

    Host-side chooser: the Pallas kernel needs a TPU (or interpret mode for
    tests), an f32 operand, and the VMEM budget of :func:`pallas_spmv_plan`.
    Callers fall back to solvers.dia.dia_spmv when this returns None.
    """
    platform = platform or jax.default_backend()
    if platform != "tpu" and not interpret:
        return None
    if dtype is not None and jnp.dtype(dtype).itemsize != 4:
        return None
    plan = pallas_spmv_plan(n, offsets, interpret=interpret)
    if plan is None:
        return None
    return (
        lambda values: prep_values(plan, values),
        lambda values_t, x: pallas_spmv(plan, values_t, x),
    )
