"""Block-ELL sparse format: the TPU-fast general-mesh SpMV.

The dof-level ELL SpMV gathers one SCALAR per (row, slot):
``x[colidx]`` with n_dof*width ~ 12M gathered rows at the 0.5M-element
scale costs 84 ms/iteration on a v5e (measured; ~1.2 GB/s effective -- the
gather row count, not the bytes, is what the TPU pays for).  Grouping the
dm x dm dof couplings of each NODE pair into one dense block turns the same
operator into (n_nodes, node_width) block rows whose SpMV gathers
(dm,)-VECTOR rows -- 9x fewer gathered rows for dm=3 -- and measures
5.4 ms/iteration on the same operator: a 15.7x speedup with identical
semantics.  (Offset concentration was measured first and does NOT hold on
unstructured meshes -- the top 512 of ~4000 RCM offsets cover only 66% of
the nnz -- so a DIA-style remainder split loses; the block gather wins on
any mesh.)

Three pieces:

* :func:`build_bell_plan` (host): maps an existing dof-ELL pattern
  (topology.build_pattern) to the block layout -- a pure slot permutation,
  so FEMSystem keeps assembling/BC-eliminating in dof-ELL and converts the
  eliminated operator ONCE per solve (one 84 ms-class gather) while every
  CG/V-cycle iteration runs on blocks.
* :func:`bell_spmv`: rectangular-block SpMV (square br=bc=dm for operators;
  br x bc for AMG prolongators/restrictions, e.g. dm x 6).
* :func:`csr_to_bell` (host): scipy CSR -> block-ELL arrays for operators
  built on the host (AMG coarse levels, block size 6).

(ref counterpart: the reference's only SpMV is the dof-scalar gather,
conjugateGradientSolver.py:53-58)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BellPlan:
    """Host-built conversion plan from a dof-ELL pattern to block-ELL."""

    n_nodes: int
    dm: int
    width: int  # node-row width (max node-graph degree + 1)
    ncol: np.ndarray  # (n_nodes, width) int32 node column ids (pad: 0)
    #: (n_nodes, width, dm, dm) int32: for each block entry, the FLAT slot
    #: in the dof-ELL values array it comes from (pad entries point at 0)
    gather: np.ndarray
    valid: np.ndarray  # (n_nodes, width) bool


def build_bell_plan(pattern, dm: int) -> BellPlan:
    """dof-ELL pattern -> block plan (host, numpy; one pass over the CSR).

    Requires every dm x dm coupling of a node pair to be present in the
    dof pattern -- true by construction for FEM patterns built from
    element connectivity (topology.build_pattern, multiblock
    build_union_pattern).
    """
    n_dof = pattern.n_dof
    n_nodes = n_dof // dm
    indptr, indices = pattern.csr_indptr, pattern.csr_indices
    counts = np.diff(indptr)
    rows0 = np.arange(n_nodes) * dm
    width = int(np.ceil(counts[rows0].max() / dm))

    # node neighbor lists from each node's FIRST dof row (all dm rows of a
    # node couple to the same node set; columns are sorted, so every dm-th
    # entry starts a new neighbor node)
    starts = indptr[rows0]
    nbr_counts = (counts[rows0] // dm).astype(np.int64)
    # vectorized per-row aranges (a Python-level concatenate of n_nodes
    # small aranges measured ~6 s at 91k nodes)
    total = int(nbr_counts.sum())
    row_off = np.zeros(n_nodes, dtype=np.int64)
    np.cumsum(nbr_counts[:-1], out=row_off[1:])
    rowid = np.repeat(np.arange(n_nodes), nbr_counts)
    posid = np.arange(total, dtype=np.int64) - row_off[rowid]
    take_idx = np.repeat(starts, nbr_counts) + posid * dm
    ncol = np.zeros((n_nodes, width), dtype=np.int32)
    valid = np.zeros((n_nodes, width), dtype=bool)
    ncol[rowid, posid] = (indices[take_idx] // dm).astype(np.int32)
    valid[rowid, posid] = True

    # For CSR entry k in dof row rr: node pair (rr//dm, col//dm), in-block
    # dims (rr%dm, col%dm).  Find each entry's neighbor slot by a sorted
    # lookup of its (node, nbr-node) key, then scatter the dof-ELL slot id.
    rr = np.repeat(np.arange(n_dof, dtype=np.int64), counts)
    cc = indices.astype(np.int64)
    n_r, i_r = rr // dm, (rr % dm).astype(np.int64)
    n_c, j_c = cc // dm, (cc % dm).astype(np.int64)
    entry_key = n_r * np.int64(n_nodes) + n_c
    slot_key = rowid.astype(np.int64) * np.int64(n_nodes) + ncol[rowid, posid]
    flat_slot = rowid * np.int64(width) + posid
    ksort = np.argsort(slot_key, kind="stable")
    pos = np.searchsorted(slot_key[ksort], entry_key)
    nbr_slot = flat_slot[ksort][pos]
    idx_dtype = (
        np.int32 if n_dof * pattern.width < np.iinfo(np.int32).max
        else np.int64
    )
    gather = np.zeros((n_nodes * width, dm, dm), dtype=idx_dtype)
    gather[nbr_slot, i_r, j_c] = pattern.csr_slots.astype(idx_dtype)
    return BellPlan(
        n_nodes=n_nodes, dm=dm, width=width, ncol=ncol,
        gather=gather.reshape(n_nodes, width, dm, dm), valid=valid,
    )


def bell_from_ell(values, plan: BellPlan):
    """dof-ELL values (n_dof, width_dof) -> block values
    (n_nodes, width, dm, dm); ONE permutation gather, jittable.  Pad blocks
    are zeroed (their gather source is arbitrary)."""
    flat = values.reshape(-1)
    b = flat[jnp.asarray(plan.gather.reshape(-1))].reshape(
        plan.n_nodes, plan.width, plan.dm, plan.dm
    )
    return b * jnp.asarray(
        plan.valid, dtype=values.dtype
    )[:, :, None, None]


def bell_spmv(bvalues, ncol, x):
    """y = A @ x on rectangular block-ELL.

    bvalues: (N, K, br, bc); ncol: (N, K) int32 block-column ids
    (pads hold col 0 with zero blocks); x: (N_cols * bc,).
    Returns (N * br,).
    """
    bc = bvalues.shape[-1]
    g = x.reshape(-1, bc)[ncol]  # (N, K, bc) -- the ROW gather
    return jnp.einsum("nkij,nkj->ni", bvalues, g).reshape(-1)


def csr_to_bell(
    A, br: int, bc: int, n_block_cols: int | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """scipy CSR -> (bvalues (N, K, br, bc), ncol (N, K) int32), host.

    Groups entries by (row // br, col // bc); K is the max block-row
    degree.  Works for rectangular operators (AMG P: br=dm, bc=6)."""
    A = A.tocoo()
    nbr_rows = -(-A.shape[0] // br)
    brow = A.row // br
    bcol = A.col // bc
    key = brow.astype(np.int64) * np.int64(
        n_block_cols or (-(-A.shape[1] // bc))
    ) + bcol
    uniq, inv = np.unique(key, return_inverse=True)
    ncols_of = n_block_cols or (-(-A.shape[1] // bc))
    u_row = (uniq // ncols_of).astype(np.int64)
    u_col = (uniq % ncols_of).astype(np.int32)
    cnt = np.bincount(u_row, minlength=nbr_rows)
    K = max(int(cnt.max()), 1)
    start = np.zeros(nbr_rows + 1, dtype=np.int64)
    np.cumsum(cnt, out=start[1:])
    pos = np.arange(uniq.shape[0]) - start[u_row]
    ncol = np.zeros((nbr_rows, K), dtype=np.int32)
    ncol[u_row, pos] = u_col
    slot = (u_row * K + pos)[inv]
    flat = (slot * br + A.row % br) * bc + A.col % bc
    bvalues = np.bincount(
        flat, weights=A.data, minlength=nbr_rows * K * br * bc
    ).astype(A.data.dtype).reshape(nbr_rows, K, br, bc)
    return bvalues, ncol
