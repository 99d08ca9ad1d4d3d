"""Pallas kernel for the structured-assembly DIA accumulate.

The XLA shifted-slice accumulate (structured._accumulate) is 864 statically
padded vector adds; XLA materializes the per-orientation column stacks and
re-reads the running matrix between orientations -- measured ~86 ms of the
1M-element assembly against a ~9 ms traffic roofline (and a row-major
rewrite doesn't help).  Worse, feeding a kernel with explicitly padded
stiffness planes costs another ~70 ms of XLA pad+stack copies (57-wide
unaligned lane pads).  This kernel avoids both:

* the element-stiffness einsum emits DIRECTLY into the kernel's layout: the
  cell grid is padded BEFORE the einsum (2 front x-planes >= the largest
  corner shift, 1 back x-plane + the y/z wrap layers, zero cells -> zero
  stiffness), so its (12, 12, cells) output needs no post-copy at all and
  the only prep pad is the ~50 MB dsdx/vol field, not the ~600 MB Ke;
* grid over output node-row blocks; the (3K, block) accumulator lives in
  VMEM and is written to HBM exactly once;
* per (orientation, corner-x-shift) one async DMA streams a NARROW
  (144, block + 384) window into double-buffered scratch (the x component
  of a corner shift is a whole plane -- folding it into the 128-aligned
  DMA start keeps the windows tight instead of front-pad-sized); the next
  orientation's DMAs overlap the current adds;
* every (orientation, p, q) plane maps to ONE (column, corner-shift) pair
  (structured.build_structured_plan), so the adds are static lane-sliced
  VMEM reads: offset split into a 128-aligned base + static remainder,
  exactly like kernels/dia_spmv (Mosaic requires provably aligned starts).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


#: lane cover for the in-window (dy, dz) shifts: dy*sy + dz <= sy + 1, and
#: sy = nz + 1 must stay below this for the static base/remainder split
_PF2 = 256


@dataclasses.dataclass(frozen=True)
class AccumulatePlan:
    n_rows: int  # 3 * K output columns
    rows_pad: int  # padded to a sublane multiple
    nn: int  # flat node count (nx+1)(ny+1)(nz+1)
    nn_pad: int  # padded to a block multiple
    block: int
    window: int  # block + _PF2 + 128 lane cover
    sx: int  # cell-grid x-plane stride (= (ny+1)(nz+1))
    x_front: int  # front pad x-planes (covers the x shift + _PF2 lanes)
    x_back: int  # back pad x-planes (wrap layer + window overrun)
    length: int  # padded flat cell length each keq plane must have
    #: combos[o][dx] = ((out_row, 12p+q, lane_shift), ...)
    combos: Tuple[Tuple[Tuple[Tuple[int, int, int], ...], ...], ...]
    interpret: bool = False


def build_accumulate_plan(
    plan, dtype=jnp.float32, block: int = 2048, interpret: bool = False
) -> AccumulatePlan | None:
    """Kernel plan from a structured.StructuredPlan, or None if unsupported.

    Needs a 4-byte dtype (f64 is not TPU-native; the f64 path keeps the XLA
    accumulate), nz small enough that in-window shifts fit the _PF2 lane
    cover, and the double-buffered scratch within the VMEM budget (the
    block size steps down as far as 512 to fit).
    """
    if jnp.dtype(dtype).itemsize != 4:
        return None
    nx, ny, nz = plan.nx, plan.ny, plan.nz
    K = plan.n_offsets
    sx, sy = (ny + 1) * (nz + 1), nz + 1
    if sy + 1 > _PF2 - 128:
        return None  # nz too large for the static lane split
    nn = (nx + 1) * sx
    nn_pad = _round_up(nn, block)
    # the corner x-shift (a whole plane) folds into the 128-aligned DMA
    # start, so windows stay narrow; the first start (i=0, dx=1) is
    # floor((x_front*sx - sx - _PF2) / 128)*128 and must be >= 0
    x_front = 1 + -(-_PF2 // sx)
    front = x_front * sx
    combos: List[List[List[Tuple[int, int, int]]]] = [
        [[], []] for _ in range(6)
    ]
    for (i, k), entries in plan.groups.items():
        for o, p, q, (dx, dy, dz) in entries:
            combos[o][dx].append(
                (i * K + k, 12 * p + q, _PF2 - (dy * sy + dz))
            )
    combos = tuple(
        tuple(tuple(sorted(c)) for c in by_dx) for by_dx in combos
    )
    rows_pad = _round_up(3 * K, 8)
    for blk in (block, block // 2, block // 4):
        window = blk + _PF2 + 128
        vmem = (2 * 2 * 144 * window + 2 * rows_pad * blk) * 4
        if blk >= 512 and vmem <= 12 * 1024 * 1024:
            block = blk
            break
    else:
        return None
    nn_pad = _round_up(nn, block)
    # last DMA read end: (nn_pad - block) + aligned_max + window where
    # aligned_max <= front - _PF2
    need = nn_pad - block + front - _PF2 + window
    x_back = -(-(need - (x_front + nx) * sx) // sx)
    length = (x_front + nx + x_back) * sx
    return AccumulatePlan(
        n_rows=3 * K, rows_pad=rows_pad, nn=nn, nn_pad=nn_pad, block=block,
        window=window, sx=sx, x_front=x_front, x_back=x_back, length=length,
        combos=combos, interpret=interpret,
    )


def _kernel(ap: AccumulatePlan):
    B, W, sx = ap.block, ap.window, ap.sx
    front = ap.x_front * sx

    # Mosaic requires provably 128-aligned DMA starts into tiled HBM
    # memrefs: i*B is provable (B a multiple of 128), the static
    # front - dx*sx - _PF2 part is floored to 128 and its remainder folded
    # into every combo's in-window lane shift instead.
    shift = [front - dx * sx - _PF2 for dx in range(2)]
    aligned = [(s // 128) * 128 for s in shift]
    rem = [s - a for s, a in zip(shift, aligned)]
    assert all(a >= 0 for a in aligned), (front, sx)

    def kernel(*refs):
        keq = refs[:6]
        out_ref, scratch, sems = refs[6], refs[7], refs[8]
        i = pl.program_id(0)

        def dma(o, dx, slot):
            # scratch is (4, 144, W): flat slot index 2*slot + dx
            return pltpu.make_async_copy(
                keq[o].at[:, pl.ds(i * B + aligned[dx], W)],
                scratch.at[2 * slot + dx],
                sems.at[2 * slot + dx],
            )

        for dx in range(2):
            dma(0, dx, 0).start()
        out_ref[...] = jnp.zeros_like(out_ref)
        for o in range(6):
            slot = o % 2
            if o + 1 < 6:
                for dx in range(2):
                    dma(o + 1, dx, 1 - slot).start()
            for dx in range(2):
                dma(o, dx, slot).wait()
            for dx in range(2):
                for row, pq, s in ap.combos[o][dx]:
                    s2 = s + rem[dx]
                    base, r = (s2 // 128) * 128, s2 % 128
                    win = scratch[
                        2 * slot + dx, pq : pq + 1, base : base + B + 128
                    ]
                    out_ref[row : row + 1, :] += jax.lax.slice(
                        win, (0, r), (1, r + B)
                    )

    return kernel


def pallas_accumulate(ap: AccumulatePlan, keq_planes):
    """keq_planes: 6 per-orientation (144, length) padded-cell-space
    stiffness planes -> DIA values (nn * 3, K) (jittable)."""
    out = pl.pallas_call(
        _kernel(ap),
        out_shape=jax.ShapeDtypeStruct((ap.rows_pad, ap.nn_pad), keq_planes[0].dtype),
        grid=(ap.nn_pad // ap.block,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=pl.BlockSpec(
            (ap.rows_pad, ap.block), lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 144, ap.window), keq_planes[0].dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=ap.interpret,
    )(*keq_planes)
    K = ap.n_rows // 3
    mat = out[: ap.n_rows, : ap.nn]  # (3K, nn)
    return jnp.transpose(mat.reshape(3, K, ap.nn), (2, 0, 1)).reshape(-1, K)
