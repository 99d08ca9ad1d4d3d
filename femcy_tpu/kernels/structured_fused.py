"""Fully-fused Pallas assembly: node coordinates -> DIA values in ONE kernel.

The two-stage path (structured._pallas_prep_planes + structured_accumulate)
materialises the six per-orientation (144, cells) stiffness planes in HBM --
~700 MB written by the XLA prep and read back by the accumulate kernel.
Measured on chip at the 1M-element scale: prep 77 ms, accumulate 35 ms, both
far off the bandwidth roofline.  This kernel moves the element math INSIDE:

* inputs are the 24 corner-coordinate planes + 1 validity plane (~19 MB);
  the output DIA matrix (~150 MB) is written once; nothing else touches HBM;
* per output block one DMA fetches a (25, WU) coordinate window (WU covers
  both corner-x-shift windows); the per-orientation gradients
  (dxdn/cofactors/det/dsdx) are computed once per window on the VPU;
* the material tangent is restricted to the ISOTROPIC family
  C = lam*(1x1) + 2*mu*I  (LinearIsotropic and the neo-Hookean approximate
  tangent both have this form), which collapses the B^T C B quadratic form
  to  Ke[(a,i),(b,j)] = vol * (lam*dNa_i*dNb_j + mu*dNa_j*dNb_i
                               + delta_ij * mu * dNa.dNb)
  -- ~6 VPU ops per entry instead of a 9-term tensor contraction, and a
  kernel small enough for Mosaic to unroll.  Anisotropic tangents fall back
  to the two-stage path (build_fused_plan returns None).

Lane bookkeeping (128-aligned DMA starts, static lane remainders) follows
kernels/structured_accumulate.py exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from femcy_tpu.kernels.structured_accumulate import (
    _PF2,
    AccumulatePlan,
    build_accumulate_plan,
)


def isotropic_lame(C_host: np.ndarray, rtol: float = 1.0e-6):
    """(lam, mu) if the 6x6 Voigt tangent is isotropic, else None."""
    C = np.asarray(C_host, dtype=np.float64)
    if C.shape != (6, 6):
        return None
    lam = float(C[0, 1])
    mu = float(C[3, 3])
    iso = np.zeros((6, 6))
    iso[:3, :3] = lam
    iso[np.arange(3), np.arange(3)] = lam + 2.0 * mu
    iso[np.arange(3, 6), np.arange(3, 6)] = mu
    scale = np.abs(C).max()
    if scale == 0.0 or np.abs(C - iso).max() > rtol * scale:
        return None
    return lam, mu


@dataclasses.dataclass(frozen=True)
class FusedPlan:
    ap: AccumulatePlan
    lam: float
    mu: float
    dN0: Tuple[Tuple[float, ...], ...]  # (4, 3) one-GP shape gradients
    w0: float
    wu: int  # union window width
    du: Tuple[int, int]  # per-dx offset of its window inside the union
    #: rows[o][a][b][i][j] = output row (i*K + k) of the DIA slot
    rows: Tuple
    #: ashift[o][a] = (dx, lane_shift s) of node a's corner
    ashift: Tuple


def build_fused_plan(plan, C_host, elem, dtype=jnp.float32,
                     interpret: bool = False) -> FusedPlan | None:
    """Kernel plan, or None when unsupported (anisotropic C, f64, size)."""
    lame = isotropic_lame(C_host) if C_host is not None else None
    if lame is None:
        return None
    if np.asarray(elem.dshape_at_gp).shape[0] != 1:
        return None  # one-Gauss-point elements only (C3D4)
    ap = build_accumulate_plan(plan, dtype, interpret=interpret)
    if ap is None:
        return None
    sx, sy = ap.sx, plan.nz + 1
    front = ap.x_front * sx
    shift = [front - dx * sx - _PF2 for dx in range(2)]
    aligned = [(s // 128) * 128 for s in shift]
    rem = [s - a for s, a in zip(shift, aligned)]
    du = (aligned[0] - aligned[1], 0)  # union starts at aligned[1]
    wu = ap.window + du[0]

    K = plan.n_offsets
    rows = np.full((6, 4, 4, 3, 3), -1, dtype=np.int64)
    ashift = np.full((6, 4, 2), -1, dtype=np.int64)
    for (i, k), entries in plan.groups.items():
        for o, p, q, (dx, dy, dz) in entries:
            a, b, j = p // 3, q // 3, q % 3
            assert p % 3 == i
            rows[o, a, b, i, j] = i * K + k
            s = _PF2 - (dy * sy + dz)
            ashift[o, a] = (dx, s + rem[dx] + du[dx])
    assert (rows >= 0).all() and (ashift >= 0).all()

    # VMEM: coordinate window + out block + ~40 ephemeral (1, wu) planes
    vmem = (32 * wu + ap.rows_pad * ap.block + 48 * wu) * 4
    if vmem > 13 * 1024 * 1024:
        return None

    dN0 = np.asarray(elem.dshape_at_gp)[0]
    w0 = float(np.asarray(elem.gauss_weights)[0])
    return FusedPlan(
        ap=ap, lam=lame[0], mu=lame[1],
        dN0=tuple(tuple(float(v) for v in row) for row in dN0), w0=w0,
        wu=wu, du=du,
        rows=tuple(
            tuple(tuple(tuple(tuple(int(x) for x in jj) for jj in ii)
                        for ii in bb) for bb in aa)
            for aa in rows
        ),
        ashift=tuple(
            tuple((int(dx), int(s)) for dx, s in byo) for byo in ashift
        ),
    )


def _kernel(fp: FusedPlan, kuhn):
    ap = fp.ap
    B, WU = ap.block, fp.wu
    lam, mu, w0 = fp.lam, fp.mu, fp.w0
    dN0 = fp.dN0
    # union DMA start: i*B + aligned[1] (128-aligned by construction)
    sx = ap.sx
    aligned1 = ((ap.x_front * sx - sx - _PF2) // 128) * 128
    assert aligned1 >= 0

    def kernel(xv_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            xv_ref.at[:, pl.ds(i * B + aligned1, WU)], scratch, sem
        )
        cp.start()
        cp.wait()
        out_ref[...] = jnp.zeros_like(out_ref)
        valid = scratch[24:25, :]  # (1, WU) 1.0/0.0 plane

        for o in range(6):
            corners = kuhn[o]  # 4 node indices into the 8 corner planes
            # x[n][D]: (1, WU) coordinate planes of this orientation's nodes
            x = [
                [scratch[corners[n] * 3 + D : corners[n] * 3 + D + 1, :]
                 for D in range(3)]
                for n in range(4)
            ]
            # dxdn[D][d] = sum_n dN0[n][d] * x[n][D]
            dxdn = [
                [
                    sum(dN0[n][d] * x[n][D] for n in range(4))
                    for d in range(3)
                ]
                for D in range(3)
            ]
            cof = [
                [
                    dxdn[(D + 1) % 3][(d + 1) % 3]
                    * dxdn[(D + 2) % 3][(d + 2) % 3]
                    - dxdn[(D + 1) % 3][(d + 2) % 3]
                    * dxdn[(D + 2) % 3][(d + 1) % 3]
                    for d in range(3)
                ]
                for D in range(3)
            ]
            det = sum(dxdn[0][d] * cof[0][d] for d in range(3))
            vol = det * (w0 * valid)
            inv_det = valid / jnp.where(valid > 0.5, det, 1.0)
            # dsdx[n][D] = (sum_d dN0[n][d] * cof[D][d]) * inv_det
            dsdx = [
                [
                    sum(dN0[n][d] * cof[D][d] for d in range(3)) * inv_det
                    for D in range(3)
                ]
                for n in range(4)
            ]

            for a in range(4):
                _, s3 = fp.ashift[o][a]
                base, r = (s3 // 128) * 128, s3 % 128

                def cut(v):
                    win = jax.lax.slice(v, (0, base), (1, base + B + 128))
                    return jax.lax.slice(win, (0, r), (1, r + B))

                vols = cut(vol)
                Va = [cut(dsdx[a][d]) * vols for d in range(3)]
                for b in range(4):
                    Sb = [cut(dsdx[b][d]) for d in range(3)]
                    gv = Va[0] * Sb[0] + Va[1] * Sb[1] + Va[2] * Sb[2]
                    for ii in range(3):
                        for jj in range(3):
                            row = fp.rows[o][a][b][ii][jj]
                            term = lam * (Va[ii] * Sb[jj]) + mu * (
                                Va[jj] * Sb[ii]
                            )
                            if ii == jj:
                                term = term + mu * gv
                            out_ref[row : row + 1, :] += term

    return kernel


def pallas_fused_assemble(fp: FusedPlan, xv, kuhn):
    """(32, length) padded coordinate+valid planes -> DIA values (nn*3, K)."""
    ap = fp.ap
    out = pl.pallas_call(
        _kernel(fp, kuhn),
        out_shape=jax.ShapeDtypeStruct((ap.rows_pad, ap.nn_pad), xv.dtype),
        grid=(ap.nn_pad // ap.block,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (ap.rows_pad, ap.block), lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((32, fp.wu), xv.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=ap.interpret,
    )(xv)
    K = ap.n_rows // 3
    mat = out[: ap.n_rows, : ap.nn]  # (3K, nn)
    return jnp.transpose(mat.reshape(3, K, ap.nn), (2, 0, 1)).reshape(-1, K)
