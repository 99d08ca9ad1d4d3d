"""Multi-element-type / multi-material models: per-block assembly.

The reference hard-fails on models mixing element types or materials
(/root/reference/reader/inp_info.py:125-128 allows one element type, and
main.py:23-24 builds a single material from the first set).  This module
lifts both restrictions -- beyond-parity, but essential for real meshes:

* every ``ElementBlock`` carries its own connectivity, element type and
  material (Abaqus semantics: ``*Element, type=..., elset=...`` blocks
  mapped to materials through ``*Solid Section, elset=..., material=...``);
* the global sparsity is the UNION of the per-block graphs (one host
  numpy pass building a shared padded-ELL pattern); assembly is one
  batched-einsum + segment-sum pass PER BLOCK into the same values array
  -- the device program stays static-shape, each block just contributes
  its own scatter;
* Dirichlet elimination, the linear solve (host direct / device PCG) and
  per-block stress recovery reuse the existing single-block machinery.

Linear analyses (the reference's small-deformation path); io.inp
``read_inp_multi`` parses the multi-block/multi-material schema.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from femcy_tpu import assembly, bc as bc_mod
from femcy_tpu.config import SolverConfig
from femcy_tpu.elements import ElementType
from femcy_tpu.materials import Material
from femcy_tpu.solvers.cg import pcg_solve
from femcy_tpu.solvers.direct import direct_solve
from femcy_tpu.topology import ELLPattern, colidx_valid_mask


@dataclasses.dataclass
class ElementBlock:
    """One homogeneous group of elements sharing a type and a material."""

    elements: np.ndarray  # (E, n) int32, 0-based into the shared nodes
    element: ElementType
    material: Material
    name: str = ""


def build_union_pattern(
    n_dof: int, dm: int, blocks: List[ElementBlock]
) -> Tuple[ELLPattern, List[np.ndarray], List[np.ndarray]]:
    """Shared ELL pattern over all blocks + per-block scatter/force targets.

    Same construction as topology.build_pattern's numpy path
    (ref: the sparseIJ pattern, stiffnessMtrx.py:79-89), with the (row, col)
    key set unioned across blocks and each block's contribution map sliced
    back out of the shared slot table.
    """
    keys_per_block = []
    dofs_per_block = []
    for blk in blocks:
        elements = blk.elements.astype(np.int64)
        edof = elements.shape[1] * dm
        element_dofs = (
            elements[:, :, None] * dm + np.arange(dm)
        ).reshape(elements.shape[0], edof)
        dofs_per_block.append(element_dofs)
        rows = np.broadcast_to(
            element_dofs[:, :, None], (*element_dofs.shape, edof)
        )
        cols = np.broadcast_to(
            element_dofs[:, None, :], (*element_dofs.shape, edof)
        )
        keys_per_block.append((rows * np.int64(n_dof) + cols).reshape(-1))

    keys = np.concatenate(keys_per_block)
    uniq, inv = np.unique(keys, return_inverse=True)
    row_of = (uniq // n_dof).astype(np.int64)
    col_of = (uniq % n_dof).astype(np.int64)

    row_counts = np.bincount(row_of, minlength=n_dof)
    width = int(row_counts.max())
    row_start = np.zeros(n_dof + 1, dtype=np.int64)
    np.cumsum(row_counts, out=row_start[1:])
    pos_in_row = np.arange(uniq.shape[0], dtype=np.int64) - row_start[row_of]

    colidx = np.zeros((n_dof, width), dtype=np.int32)
    colidx[row_of, pos_in_row] = col_of
    slot_of_uniq = row_of * width + pos_in_row

    diag_keys = np.arange(n_dof, dtype=np.int64) * n_dof + np.arange(n_dof)
    diag_idx = np.searchsorted(uniq, diag_keys)
    if not np.array_equal(uniq[diag_idx], diag_keys):
        raise RuntimeError(
            "model has dofs carried by no element (missing diagonal)"
        )
    diag_slot = slot_of_uniq[diag_idx].astype(np.int64)

    targets_all = slot_of_uniq[inv]
    scatter_targets = []
    start = 0
    for k in keys_per_block:
        scatter_targets.append(
            targets_all[start : start + k.shape[0]].astype(np.int64)
        )
        start += k.shape[0]
    force_targets = [
        d.reshape(-1).astype(np.int32) for d in dofs_per_block
    ]

    pattern = ELLPattern(
        n_dof=n_dof,
        width=width,
        colidx=colidx,
        row_counts=row_counts.astype(np.int32),
        valid=colidx_valid_mask(colidx, row_counts),
        diag_slot=diag_slot,
        scatter_targets=targets_all.astype(np.int64),
        force_targets=np.concatenate(force_targets),
        element_dofs=dofs_per_block[0].astype(np.int32),
        csr_indptr=row_start,
        csr_indices=col_of.astype(np.int32),
        csr_slots=slot_of_uniq,
    )
    return pattern, scatter_targets, force_targets


class MultiBlockSystem:
    """Linear static analysis over heterogeneous element blocks.

    API mirrors the linear slice of FEMSystem: assemble K as the sum of
    per-block contributions, eliminate Dirichlet dofs symmetrically, solve
    (host direct below the crossover, device PCG above), recover per-block
    stresses.
    """

    def __init__(
        self,
        nodes: np.ndarray,
        blocks: List[ElementBlock],
        config: SolverConfig = SolverConfig(),
    ):
        if not blocks:
            raise ValueError("need at least one element block")
        self.nodes = np.asarray(nodes, dtype=np.float64)
        self.dm = self.nodes.shape[1]
        dms = {blk.element.dm for blk in blocks}
        if dms != {self.dm}:
            raise ValueError(f"mixed element dimensionalities: {dms}")
        self.blocks = blocks
        self.config = config
        self.n_dof = self.nodes.shape[0] * self.dm
        self.pattern, self._targets, self._force_targets = build_union_pattern(
            self.n_dof, self.dm, blocks
        )

        self._arrs = {
            "nodes": jnp.asarray(self.nodes),
            "colidx": jnp.asarray(self.pattern.colidx),
            "diag_slot": jnp.asarray(self.pattern.diag_slot),
        }
        for bi, blk in enumerate(blocks):
            self._arrs[f"elements_{bi}"] = jnp.asarray(blk.elements)
            self._arrs[f"dN_{bi}"] = jnp.asarray(blk.element.dshape_at_gp)
            self._arrs[f"w_{bi}"] = jnp.asarray(blk.element.gauss_weights)
            self._arrs[f"C_{bi}"] = jnp.asarray(blk.material.C)
            self._arrs[f"targets_{bi}"] = jnp.asarray(self._targets[bi])
        self._jit_system = jax.jit(self._system_impl)
        self._jit_cg = jax.jit(
            lambda values, b: pcg_solve(
                values,
                self._arrs["colidx"],
                self._arrs["diag_slot"],
                b,
                eps=config.cg_eps,
                max_iters=config.cg_max_iters,
            )
        )
        self.dof = jnp.zeros(self.n_dof)

    def _system_impl(self, a, rhs, fixed, sval):
        p = self.pattern
        values = jnp.zeros(p.n_dof * p.width)
        for bi in range(len(self.blocks)):
            dsdx, vol = assembly.gradients_and_volume(
                a["nodes"], a[f"elements_{bi}"], a[f"dN_{bi}"], a[f"w_{bi}"]
            )
            Ke = assembly.element_stiffness(dsdx, vol, a[f"C_{bi}"])
            values = values + jax.ops.segment_sum(
                Ke.reshape(-1),
                a[f"targets_{bi}"],
                num_segments=p.n_dof * p.width,
            )
        values = values.reshape(p.n_dof, p.width)
        values, rhs = bc_mod.apply_dirichlet_linear(
            values, a["colidx"], a["diag_slot"], rhs, fixed, sval
        )
        return values, rhs

    # ------------------------------------------------------------------ #
    def solve(self, rhs, fixed, sval):
        """K x = rhs with symmetric Dirichlet elimination; sets self.dof."""
        cfg = self.config
        values, b = self._jit_system(
            self._arrs,
            jnp.asarray(rhs),
            jnp.asarray(fixed),
            jnp.asarray(sval),
        )
        use_direct = cfg.linear_solver == "direct" or (
            cfg.linear_solver == "auto"
            and self.n_dof < cfg.direct_solve_max_dof
        )
        if use_direct:
            self.dof = jnp.asarray(direct_solve(self.pattern, values, b))
        else:
            self.dof, _, _ = self._jit_cg(values, b)
        return self.dof

    def solve_model(self, model) -> jax.Array:
        """Convenience: solve a read_inp_multi model (its Dirichlet BCs at
        full load; linear analyses have one increment)."""
        from femcy_tpu.mesh import FEMesh

        fixed = np.zeros(self.n_dof, dtype=bool)
        sval = np.zeros(self.n_dof)
        for bcd in model.dirichlet_bcs:
            dofs = bcd.node_set * self.dm + bcd.dof
            fixed[dofs] = True
            sval[dofs] = bcd.value
        rhs = np.zeros(self.n_dof)
        nbcs = getattr(model, "neumann_bcs", [])
        if nbcs:
            # a *Surface may span blocks of different element types: route
            # each facet to the block whose boundary owns it (facet
            # quadrature needs that block's own shape functions)
            meshes = [
                FEMesh(self.nodes, blk.elements, blk.element)
                for blk in self.blocks
            ]
            for nbc in nbcs:
                remaining = [tuple(f) for f in nbc.face_set]
                for mesh_b in meshes:
                    owned = [f for f in remaining if f in mesh_b.boundary]
                    if not owned:
                        continue
                    sub = dataclasses.replace(nbc, face_set=owned)
                    rhs += nbc.traction * bc_mod.neumann_unit_pattern(
                        mesh_b, sub
                    )
                    owned_set = set(owned)
                    remaining = [f for f in remaining if f not in owned_set]
                if remaining:
                    raise ValueError(
                        f"{len(remaining)} loaded facet(s) are on no "
                        "block's boundary (e.g. an interior *Surface)"
                    )
        return self.solve(rhs, fixed, sval)

    # ------------------------------------------------------------------ #
    def block_mesh(self, bi: int):
        """FEMesh view of block bi over the shared node table (cached:
        boundary extraction is the expensive part)."""
        from femcy_tpu.mesh import FEMesh

        if not hasattr(self, "_block_meshes"):
            self._block_meshes: dict = {}
        if bi not in self._block_meshes:
            blk = self.blocks[bi]
            self._block_meshes[bi] = FEMesh(
                self.nodes, blk.elements, blk.element
            )
        return self._block_meshes[bi]

    def extrapolate_block(self, bi: int, gp_vals):
        """GP -> nodal patch extrapolation with block bi's own element
        matrices, (E_bi, G_bi) -> (E_bi, n_nodes_bi) (the per-type twin of
        FEMSystem.extrapolate; ref: the per-element extrapolate kernels)."""
        M = jnp.asarray(self.blocks[bi].element.extrapolation_matrix)
        return gp_vals @ M.T

    def elastic_energy(self) -> float:
        """Total elastic energy summed over blocks: each block's own
        material psi(F) integrated with its GP volumes (the linear twin of
        FEMSystem.elastic_energy; ref: stiffnessMtrx.py:592-606)."""
        a = self._arrs
        total = 0.0
        for bi, blk in enumerate(self.blocks):
            dsdX0, vol = assembly.gradients_and_volume(
                a["nodes"], a[f"elements_{bi}"], a[f"dN_{bi}"], a[f"w_{bi}"]
            )
            F = assembly.deformation_gradient(
                self.dof, a[f"elements_{bi}"], dsdX0
            )
            dens = assembly.gp_energy_density(F, blk.material)
            total += float(jnp.sum(dens * vol))
        return total

    def block_stress(self, bi: int):
        """(strain, cauchy stress, mises) per (element, GP) of block bi
        (small-deformation recovery, like the linear reference path)."""
        from femcy_tpu.system import mises_stress

        blk = self.blocks[bi]
        a = self._arrs
        dsdX0, _ = assembly.gradients_and_volume(
            a["nodes"], a[f"elements_{bi}"], a[f"dN_{bi}"], a[f"w_{bi}"]
        )
        F = assembly.deformation_gradient(
            self.dof, a[f"elements_{bi}"], dsdX0
        )
        eye = jnp.eye(self.dm)
        strain = (F + jnp.swapaxes(F, -1, -2)) / 2.0 - eye
        stress = assembly.gp_stress(F, blk.material, large=False)
        return strain, stress, mises_stress(stress, blk.material)


def system_from_model(model, config: SolverConfig = SolverConfig()):
    """InpBlockModel (io.inp.read_inp_multi) -> MultiBlockSystem."""
    from femcy_tpu.elements import get_element
    from femcy_tpu.materials import material_from_inp

    blocks = []
    for bi, (etype, elset, elements) in enumerate(model.element_blocks):
        mtype, params = model.material_of_block(bi)
        blocks.append(
            ElementBlock(
                elements=elements,
                element=get_element(etype),
                material=material_from_inp(mtype, params, etype),
                name=elset,
            )
        )
    return MultiBlockSystem(model.nodes, blocks, config)
