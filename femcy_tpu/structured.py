"""Dense scatter-free assembly for structured box_tets meshes.

Any indexed op over the ~E*edof^2 stiffness contributions costs ~8 ns/element
through XLA's TPU gather/scatter -- seconds at the 1M-element scale.  On a
structured Kuhn-subdivided box (meshgen.box_tets) none of that is necessary:
elements of one orientation form a dense cell grid, and every (orientation,
local-row-node, local-col-node, i, j) combination writes to ONE diagonal
offset of the DIA matrix with ONE static {0,1}^3 corner shift.  Assembly then
is 864 statically-padded dense adds of cell-grid arrays -- pure streaming VPU
work, no scatter instruction at all.

This is the structured-grid fast path; unstructured meshes use the general
segment-sum scatter (assembly.scatter_stiffness / dia_scatter).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from femcy_tpu.mesh import FEMesh
from femcy_tpu.solvers.dia import DIAPattern


@dataclasses.dataclass(frozen=True)
class StructuredPlan:
    nx: int
    ny: int
    nz: int
    n_offsets: int
    #: (i, k) -> list of (orientation, 3a+i, 3b+j, (dx, dy, dz)) combos
    groups: Dict[Tuple[int, int], List[Tuple[int, int, int, Tuple[int, int, int]]]]


def build_structured_plan(mesh: FEMesh, dia: DIAPattern) -> StructuredPlan:
    """Map every element-stiffness entry class to its DIA slot, host-side."""
    info = mesh.structure
    assert info is not None and info["kind"] == "box_tets"
    nx, ny, nz = info["nx"], info["ny"], info["nz"]
    kuhn = info["kuhn"]
    delta = np.asarray(info["corner_delta"])  # (8, 3) cube corner offsets

    def node_stride():
        return np.array([(ny + 1) * (nz + 1), nz + 1, 1])

    stride = node_stride()
    offsets = np.asarray(dia.offsets)
    groups: Dict[Tuple[int, int], List] = {}
    for o, corners in enumerate(kuhn):
        d = delta[list(corners)]  # (4, 3) corner offset of each tet node
        for a in range(4):
            for b in range(4):
                node_off = int((d[b] - d[a]) @ stride)
                for i in range(3):
                    for j in range(3):
                        off = 3 * node_off + (j - i)
                        k = int(np.searchsorted(offsets, off))
                        assert offsets[k] == off, "offset missing from DIA"
                        key = (i, k)
                        groups.setdefault(key, []).append(
                            (o, 3 * a + i, 3 * b + j, tuple(int(x) for x in d[a]))
                        )
    return StructuredPlan(
        nx=nx, ny=ny, nz=nz, n_offsets=dia.n_offsets, groups=groups
    )


def structured_dia_scatter(Ke, plan: StructuredPlan):
    """Element stiffnesses (E, 12, 12) -> DIA values (n_dof, K), gather-free.

    E must be 6 * nx * ny * nz in box_tets cell-major order.
    """
    nx, ny, nz, K = plan.nx, plan.ny, plan.nz, plan.n_offsets
    Ke_grid = Ke.reshape(nx, ny, nz, 6, 12, 12)

    cols = []
    for i in range(3):
        for k in range(K):
            combos = plan.groups.get((i, k))
            if not combos:
                cols.append(None)
                continue
            acc = None
            for o, p, q, (dx, dy, dz) in combos:
                term = jnp.pad(
                    Ke_grid[:, :, :, o, p, q],
                    ((dx, 1 - dx), (dy, 1 - dy), (dz, 1 - dz)),
                )
                acc = term if acc is None else acc + term
            cols.append(acc)

    zero = jnp.zeros((nx + 1, ny + 1, nz + 1), dtype=Ke.dtype)
    # stack to (nx1, ny1, nz1, 3, K) == (n_dof, K) in node-major dof order
    mat = jnp.stack(
        [
            jnp.stack(
                [cols[i * K + k] if cols[i * K + k] is not None else zero
                 for k in range(K)],
                axis=-1,
            )
            for i in range(3)
        ],
        axis=-2,
    )
    return mat.reshape(-1, K)
