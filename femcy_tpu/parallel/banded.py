"""Gather-free general-mesh sharding: RCM + block-tridiagonal row slabs.

The first general (unstructured-mesh) multi-chip design (parallel/sharded.py)
is correctness-first: its SpMV gathers x rows through the ELL column index --
the access pattern the single-chip work measured ~500x off HBM speed on TPU
and replaced with DIA shifted slices (solvers/dia.py).  Unstructured meshes
cannot reuse that trick directly: after a bandwidth-reducing reordering the
set of distinct (col - row) offsets fills the whole band (measured: K =
2*bw + 1 on every tet/tri mesh tried), so per-offset shifted slices would
mean thousands of HLO ops per SpMV.

The TPU-native answer is one step coarser -- **block-tridiagonal storage**:

* **Host setup.**  Reverse-Cuthill-McKee on the dof graph bounds the
  bandwidth ``bw``; rows are cut into blocks of ``B >= bw`` dofs.  Every
  matrix entry then lands in the block diagonal, the first block
  subdiagonal or the first block superdiagonal: three dense (nb, B, B)
  arrays hold the whole operator.

* **SpMV = three batched matmuls.**  y_I = D_I x_I + L_I x_{I-1} +
  U_I x_{I+1} -- MXU einsums over dense blocks, O(1) HLO ops, no gather,
  no scatter.  The memory overhead vs the exact sparsity (3*B/row_width) is
  the price of regularity; on TPU it beats the gather path by a wide margin
  because the blocks stream at HBM speed.

* **Sharding.**  Each device owns ``nbl`` consecutive row blocks.  Elements
  are assigned to the device that owns their smallest row block; one
  block-row halo-add after assembly and one x-block ppermute per neighbour
  per SpMV are the only collectives.  The CG loop (collectives included)
  lives in one shard_map'd ``lax.while_loop``; its compiled HLO contains no
  gather/scatter instruction (asserted in tests/test_banded.py).

The reference has no distributed execution at all (SURVEY.md §2.5); this
replaces the all_gather + row-gather SpMV of parallel/sharded.py as the
production general-mesh multi-chip path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from femcy_tpu import assembly
from femcy_tpu.materials import Material
from femcy_tpu.mesh import FEMesh
from femcy_tpu.topology import build_pattern

AXIS = "fem_mesh"


@dataclasses.dataclass
class BandedOperands:
    """Host-built static data for a block-tridiagonal sharded solve."""

    n_devices: int
    n_dof: int
    B: int  # block size (>= RCM bandwidth)
    nb: int  # row blocks covering n_dof
    nbl: int  # row blocks per device (nb padded to D * nbl)
    perm: np.ndarray  # (n_dof,) original dof of permuted slot i
    iperm: np.ndarray  # (n_dof,) permuted slot of original dof j
    # stacked per-device arrays (leading axis = device)
    elements: np.ndarray  # (D, E_s, n) padded element shards
    ele_weight: np.ndarray  # (D, E_s)
    scatter_targets: np.ndarray  # (D, E_s*edof^2) into (nbl+1)*3*B*B
    force_targets: np.ndarray  # (D, E_s*edof) into (nbl+1)*B local rows
    nodes: np.ndarray
    dshape_gp: np.ndarray
    weights_gp: np.ndarray
    C: np.ndarray

    @property
    def rows_local(self) -> int:
        return self.nbl * self.B


def rcm_permutation(pattern) -> np.ndarray:
    """Reverse-Cuthill-McKee ordering of the dof graph (host, scipy)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    A = sp.csr_matrix(
        (
            np.ones_like(pattern.csr_indices, dtype=np.float32),
            pattern.csr_indices,
            pattern.csr_indptr,
        ),
        shape=(pattern.n_dof, pattern.n_dof),
    )
    return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))


def build_banded_operands(
    mesh: FEMesh,
    material: Material,
    n_devices: int,
    block: Optional[int] = None,
    pattern=None,
) -> BandedOperands:
    # the ELL pattern build is the dominant host setup cost on large
    # unstructured meshes; callers that already hold one (FEMSystem) pass
    # it in instead of paying it twice
    if pattern is None:
        pattern = build_pattern(mesh)
    n_dof = pattern.n_dof
    D = n_devices
    perm = rcm_permutation(pattern)
    iperm = np.empty(n_dof, dtype=np.int64)
    iperm[perm] = np.arange(n_dof)

    # permuted bandwidth from the ELL structure
    rows = np.repeat(np.arange(n_dof), pattern.row_counts)
    prow = iperm[rows]
    pcol = iperm[pattern.csr_indices.astype(np.int64)]
    bw = int(np.abs(pcol - prow).max())
    if block is None:
        block = max(8, -(-(bw) // 8) * 8)  # round up to a multiple of 8
    if block < bw:
        raise ValueError(f"block {block} smaller than the RCM bandwidth {bw}")
    B = block
    nb = -(-n_dof // B)
    nbl = -(-nb // D)

    # --- element shards by smallest permuted row --------------------------
    dm = mesh.dm
    edof = mesh.element.edof
    E = mesh.n_elements
    ele_dofs = (
        mesh.elements.astype(np.int64)[:, :, None] * dm + np.arange(dm)
    ).reshape(E, edof)
    ele_prows = iperm[ele_dofs]  # (E, edof)
    min_block = ele_prows.min(axis=1) // B
    dev_of_ele = np.minimum(min_block // nbl, D - 1).astype(np.int64)

    counts = np.bincount(dev_of_ele, minlength=D)
    E_s = int(counts.max())
    order = np.argsort(dev_of_ele, kind="stable")

    elements_sh = np.zeros((D, E_s, mesh.element.n_nodes), dtype=np.int32)
    weight_sh = np.zeros((D, E_s))
    targets_sh = np.zeros((D, E_s * edof * edof), dtype=np.int64)
    ftargets_sh = np.zeros((D, E_s * edof), dtype=np.int64)

    # per-entry block-tridiagonal slots: entry (prow r, pcol c) of an element
    # owned by device d lands in local row block Il = r//B - d*nbl in
    # [0, nbl] (min-row assignment + B >= bw guarantee the +1 halo row block
    # suffices), band position J - I + 1 in {0, 1, 2}
    for d in range(D):
        sel = order[counts[:d].sum() : counts[: d + 1].sum()]
        ne = sel.shape[0]
        elements_sh[d, :ne] = mesh.elements[sel]
        # padding uses element 0's (valid) geometry with zero weight: its Ke
        # is exactly zero, and its zeroed targets add 0 to local slot 0
        elements_sh[d, ne:] = mesh.elements[0]
        weight_sh[d, :ne] = 1.0
        pr = ele_prows[sel]  # (ne, edof)
        r = pr[:, :, None]
        c = pr[:, None, :]
        I = r // B
        J = c // B
        Il = I - d * nbl
        band = J - I + 1
        assert (Il >= 0).all() and (Il <= nbl).all()
        assert (band >= 0).all() and (band <= 2).all()
        flat = ((Il * 3 + band) * B + r % B) * B + (c - J * B)
        targets_sh[d, : ne * edof * edof] = flat.reshape(-1)
        # force rows: same local row block + in-block offset, vector layout
        ftargets_sh[d, : ne * edof] = (
            (pr // B - d * nbl) * B + pr % B
        ).reshape(-1)

    return BandedOperands(
        n_devices=D,
        n_dof=n_dof,
        B=B,
        nb=nb,
        nbl=nbl,
        perm=perm,
        iperm=iperm,
        elements=elements_sh,
        ele_weight=weight_sh,
        scatter_targets=targets_sh,
        force_targets=ftargets_sh,
        nodes=mesh.nodes,
        dshape_gp=mesh.element.dshape_at_gp,
        weights_gp=mesh.element.gauss_weights,
        C=material.C,
    )


# --------------------------------------------------------------------------- #
# device-side pieces (under shard_map; arrays are one device's block)
# --------------------------------------------------------------------------- #
def _neighbor_blocks(D: int, xb):
    """(nbl, B) local x blocks -> (x_{I-1}, x_{I+1}) including the single
    boundary block from each neighbour (edge devices receive zeros)."""
    from_left = jax.lax.ppermute(
        xb[-1], AXIS, perm=[(i, i + 1) for i in range(D - 1)]
    )
    from_right = jax.lax.ppermute(
        xb[0], AXIS, perm=[(i + 1, i) for i in range(D - 1)]
    )
    x_lo = jnp.concatenate([from_left[None], xb[:-1]], axis=0)
    x_hi = jnp.concatenate([xb[1:], from_right[None]], axis=0)
    return x_lo, x_hi


def _btd_spmv(D: int, V, x_local):
    """y = A x on the local row blocks.  V: (nbl, 3, B, B) [lower, diag,
    upper]; three batched MXU matmuls + two one-block ppermutes."""
    nbl, _, B, _ = V.shape
    xb = x_local.reshape(nbl, B)
    x_lo, x_hi = _neighbor_blocks(D, xb)
    y = (
        jnp.einsum("bij,bj->bi", V[:, 1], xb)
        + jnp.einsum("bij,bj->bi", V[:, 0], x_lo)
        + jnp.einsum("bij,bj->bi", V[:, 2], x_hi)
    )
    return y.reshape(-1)


def _btd_dirichlet_linear(D: int, V, rhs_local, fixed_local, sval_local):
    """Symmetric zero-one elimination on the local block rows."""
    nbl, _, B, _ = V.shape
    fb = fixed_local.reshape(nbl, B)
    sb = sval_local.reshape(nbl, B)
    f_lo, f_hi = _neighbor_blocks(D, fb.astype(V.dtype))
    s_lo, s_hi = _neighbor_blocks(D, sb)
    col_fixed = jnp.stack([f_lo, fb.astype(V.dtype), f_hi], axis=1)  # (nbl,3,B)
    col_sval = jnp.stack([s_lo, sb, s_hi], axis=1)
    # move prescribed-column loads to the rhs
    corr = jnp.einsum("bkij,bkj->bi", V, col_fixed * col_sval)
    rhs_local = rhs_local - corr.reshape(-1)
    rhs_local = jnp.where(fixed_local, sval_local, rhs_local)
    # zero fixed columns and rows
    V = V * (1.0 - col_fixed)[:, :, None, :]
    V = V * (1.0 - fb.astype(V.dtype))[:, None, :, None]
    # unit diagonal on fixed rows
    didx = jnp.arange(B)
    diag = V[:, 1, didx, didx]
    V = V.at[:, 1, didx, didx].set(jnp.where(fb, 1.0, diag))
    return V, rhs_local


def _btd_pcg(
    D: int,
    V,
    b_local,
    eps: float,
    max_iters: int,
    minv_blocks=None,
    kind: str = "block",
):
    """PCG on the block-tridiagonal operator, one while_loop, psum
    reductions -- the compiled program is gather/scatter-free.

    Preconditioners (``minv_blocks`` = the cached setup operand):

    * ``kind='tridiag'`` (the default in the solver): exact solve of the
      DEVICE-LOCAL block-tridiagonal operator (non-overlapping block
      Schwarz) via the precomputed block-Thomas factorization
      ``minv_blocks = stack([Sinv, LS, SU])`` -- see
      :func:`_btd_thomas_factor`.  Apply = one batched MXU einsum + a
      forward and a backward ``lax.scan`` of B-sized matvecs (~= one extra
      SpMV of flops).  Measured on the 54.8k-dof dryrun cantilever: 399 ->
      228 scalar-Jacobi iterations at 8 shards (numpy harness; 721 -> ~410
      expected at the MULTICHIP_r03 fixture).
    * ``kind='block'``: block-Jacobi z = D_I^-1 r_I from the materialized
      diagonal blocks, ``minv_blocks`` (1, nbl, B, B).  Measured WORSE than
      scalar Jacobi on RCM-banded 3D elasticity (578 vs 399 iterations on
      the same harness: the level-set blocks are cross-section planes, and
      inverting in-plane coupling does nothing for the dominant bending
      modes while distorting the spectrum) -- kept for comparison.
    * ``minv_blocks=None``: scalar Jacobi."""
    nbl, _, B, _ = V.shape

    if minv_blocks is not None and kind == "tridiag":
        Sinv, LS, SU = minv_blocks[0], minv_blocks[1], minv_blocks[2]

        def apply_m(r):
            rb = r.reshape(nbl, B)

            def fwd(y_prev, op):
                LSi, ri = op
                y = ri - LSi @ y_prev
                return y, y

            _, ys = jax.lax.scan(
                fwd, jnp.zeros(B, dtype=r.dtype), (LS, rb)
            )
            sy = jnp.einsum("bij,bj->bi", Sinv, ys)

            def bwd(z_next, op):
                SUi, syi = op
                z = syi - SUi @ z_next
                return z, z

            _, zs = jax.lax.scan(
                bwd, jnp.zeros(B, dtype=r.dtype), (SU, sy), reverse=True
            )
            return zs.reshape(-1)

    elif minv_blocks is not None:

        def apply_m(r):
            return jnp.einsum(
                "bij,bj->bi", minv_blocks, r.reshape(nbl, B)
            ).reshape(-1)

    else:
        # identity-masked reduction, NOT V[:, 1, i, i] advanced indexing --
        # the latter lowers to an HLO gather, which this program must not
        # contain
        diag = jnp.sum(V[:, 1] * jnp.eye(B, dtype=V.dtype), axis=2).reshape(-1)
        minv = jnp.where(diag != 0.0, 1.0 / diag, 0.0)

        def apply_m(r):
            return minv * r

    def pdot(u, v):
        return jax.lax.psum(jnp.dot(u, v), AXIS)

    r0 = b_local
    d0 = apply_m(r0)
    x0 = jnp.zeros_like(b_local)
    rmax0 = jax.lax.pmax(jnp.max(jnp.abs(r0)), AXIS)

    def cond(state):
        _, _, _, _, k, rmax = state
        return (k < max_iters) & (rmax >= eps * rmax0) & (rmax0 > 0.0)

    def body(state):
        x, r, d, rmr, k, _ = state
        Ad = _btd_spmv(D, V, d)
        alpha = rmr / pdot(d, Ad)
        x = x + alpha * d
        r = r - alpha * Ad
        z = apply_m(r)
        rmr_new = pdot(r, z)
        d = z + (rmr_new / rmr) * d
        rmax = jax.lax.pmax(jnp.max(jnp.abs(r)), AXIS)
        return x, r, d, rmr_new, k + 1, rmax

    rmr0 = pdot(r0, d0)
    x, r, _, _, k, rmax = jax.lax.while_loop(
        cond, body, (x0, r0, d0, rmr0, jnp.int32(0), rmax0)
    )
    return x, k, rmax


def _btd_block_inv(V):
    """(nbl, 3, B, B) local blocks -> D_I^-1 (nbl, B, B): the block-Jacobi
    preconditioner setup.  LU-based inverse (not Cholesky) so near-limit
    indefinite tangents don't NaN.  Padding rows past n_dof are all-zero in
    the Newton path (their residual is identically zero, so scalar Jacobi
    ignored them silently); a unit diagonal is inserted there to keep the
    block invertible -- the zero row/column makes the patched block exactly
    [[A, 0], [0, I]], whose inverse leaves the live dofs untouched."""
    Dg = V[0][:, 1]
    B = Dg.shape[-1]
    eye = jnp.eye(B, dtype=Dg.dtype)
    diag = jnp.sum(Dg * eye, axis=2)  # (nbl, B), no gather
    Dg = Dg + jnp.where(diag == 0.0, 1.0, 0.0)[:, :, None] * eye[None]
    return jnp.linalg.inv(Dg)[None]


def _btd_thomas_factor(V):
    """Block-Thomas factorization of the DEVICE-LOCAL block-tridiagonal
    operator (inter-device couplings dropped -> non-overlapping block
    Schwarz; the result is SPD whenever the tangent is).

    Schur recursion ``S_1 = D_1, S_i = D_i - L_i S_{i-1}^-1 U_{i-1}`` (a
    sequential lax.scan of B x B inverses, once per increment), then the
    per-iteration apply operands: ``Sinv`` (z-scaling), ``LS_i = L_i
    Sinv_{i-1}`` (forward sweep), ``SU_i = Sinv_i U_i`` (backward sweep) --
    stacked (3, nbl, B, B) so one cached device array feeds the CG program.
    Padded all-zero rows get a unit diagonal exactly like
    :func:`_btd_block_inv`."""
    Vl = V[0]
    nbl, _, B, _ = Vl.shape
    eye = jnp.eye(B, dtype=Vl.dtype)
    Dg = Vl[:, 1]
    diag = jnp.sum(Dg * eye, axis=2)
    Dg = Dg + jnp.where(diag == 0.0, 1.0, 0.0)[:, :, None] * eye[None]
    # L of the first local block / U of the last couple to NEIGHBOR devices
    # (applied via ppermute in the SpMV): excluded from the local solve
    L = Vl[:, 0] * jnp.where(jnp.arange(nbl) == 0, 0.0, 1.0)[:, None, None]
    U = Vl[:, 2] * (
        jnp.where(jnp.arange(nbl) == nbl - 1, 0.0, 1.0)[:, None, None]
    )
    Uprev = jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], axis=0)

    def step(sinv_prev, op):
        Li, Di, Upi = op
        S = Di - Li @ sinv_prev @ Upi
        sinv = jnp.linalg.inv(S)
        return sinv, sinv

    _, Sinv = jax.lax.scan(
        step, jnp.zeros((B, B), dtype=Vl.dtype), (L, Dg, Uprev)
    )
    Sinv_prev = jnp.concatenate([jnp.zeros_like(Sinv[:1]), Sinv[:-1]], axis=0)
    LS = jnp.einsum("bij,bjk->bik", L, Sinv_prev)
    SU = jnp.einsum("bij,bjk->bik", Sinv, U)
    return jnp.stack([Sinv, LS, SU])[None]


def _btd_dirichlet_newton(D: int, V, fixed_local):
    """Newton Dirichlet treatment on the local block rows: zero fixed rows
    and columns, unit diagonal (the residual is zeroed by the caller)."""
    nbl, _, B, _ = V.shape
    fb = fixed_local.reshape(nbl, B)
    f_lo, f_hi = _neighbor_blocks(D, fb.astype(V.dtype))
    col_fixed = jnp.stack([f_lo, fb.astype(V.dtype), f_hi], axis=1)
    V = V * (1.0 - col_fixed)[:, :, None, :]
    V = V * (1.0 - fb.astype(V.dtype))[:, None, :, None]
    didx = jnp.arange(B)
    diag = V[:, 1, didx, didx]
    V = V.at[:, 1, didx, didx].set(jnp.where(fb, 1.0, diag))
    return V


def _btd_newton_eval(D, nbl, B, n_dof, material, geometric_stiffness,
                     tangent,
                     elements, ele_weight, targets, ftargets, iperm,
                     nodes, dN, w, C, dof, rhs, fixed, sval,
                     stab_diag=None, stab_ref=None, stab_scale=None):
    """One full Newton residual/Jacobian evaluation on this device's element
    shard -- the general-mesh twin of parallel.structured._shard_newton_eval
    (which mirrors FEMSystem._newton_eval_impl / the reference's
    stiffnessMtrx.py:609-644 + 756-758 + 310-341).

    The working dof lives in the permuted block-row space; assembly needs
    the original ordering, so the program all_gathers the local blocks and
    unpermutes once per evaluation (a single n_dof gather OUTSIDE the CG --
    the CG program itself stays gather-free).
    """
    elements = elements[0]
    ele_weight = ele_weight[0]
    targets = targets[0]
    ftargets = ftargets[0]
    dof_local = dof[0]
    rhs_local = rhs[0]
    fixed_local = fixed[0]
    sval_local = sval[0]

    # pin prescribed dofs (ref: dirichletBC_dof, stiffnessMtrx.py:344-366)
    dof_local = jnp.where(fixed_local, sval_local, dof_local)
    full_perm = jax.lax.all_gather(dof_local, AXIS, tiled=True)
    dof_orig = full_perm[iperm]  # (n_dof,) -- original dof ordering
    dm = nodes.shape[1]
    u = dof_orig.reshape(-1, dm)
    coords = nodes + u

    dsdX0, _ = assembly.gradients_and_volume(nodes, elements, dN, w)
    F = assembly.deformation_gradient_u(u[elements], dsdX0)
    sigma = assembly.gp_stress(F, material, large=True)
    dsdx, vol = assembly.gradients_and_volume(coords, elements, dN, w)
    vol = vol * ele_weight[:, None]

    # internal force into local (+1 halo) row blocks, one block halo-add
    f_elem = jnp.einsum("egaj,egji,eg->eai", dsdx, sigma, vol)
    fbuf = jax.ops.segment_sum(
        f_elem.reshape(-1), ftargets, num_segments=(nbl + 1) * B
    )
    from_left_f = jax.lax.ppermute(
        fbuf[nbl * B :], AXIS, perm=[(i, i + 1) for i in range(D - 1)]
    )
    f_int = fbuf[: nbl * B].at[:B].add(from_left_f)
    if stab_diag is not None:
        # stabilization / Newmark hook in the permuted block-row space:
        # force scale*M*(dof - ref) on the local rows (padded rows carry
        # diag 0, so they stay inert); the tangent diagonal add happens
        # after V is built below.  Gather-free (eye-masked).
        stab_d = stab_scale[0] * stab_diag[0]
        f_int = f_int + stab_d * (dof_local - stab_ref[0])
    residual = f_int - rhs_local
    residual = jnp.where(fixed_local, 0.0, residual)

    # tangent in block-tridiagonal layout: secant (+ geometric), or the
    # exact consistent tangent (assembly.consistent_tangent -- edof scanned
    # JVPs of the per-element internal force, vmapped over this device's
    # element shard; boundary-duplicated elements scale by ele_weight, legal
    # because Ke is linear in vol)
    if tangent == "consistent":
        Ke = assembly.consistent_tangent(
            dof_orig, elements, nodes, dN, w, material
        ) * ele_weight[:, None, None]
    else:
        Ke = assembly.element_stiffness(dsdx, vol, C)
        if geometric_stiffness:
            Ke = Ke + assembly.geometric_stiffness(dsdx, sigma, vol)
    buf = jax.ops.segment_sum(
        Ke.reshape(-1), targets, num_segments=(nbl + 1) * 3 * B * B
    ).reshape(nbl + 1, 3, B, B)
    from_left_V = jax.lax.ppermute(
        buf[nbl], AXIS, perm=[(i, i + 1) for i in range(D - 1)]
    )
    V = buf[:nbl].at[0].add(from_left_V)
    if stab_diag is not None:
        V = V.at[:, 1].add(
            jnp.eye(B, dtype=V.dtype)[None]
            * stab_d.reshape(nbl, B)[:, :, None]
        )
    V = _btd_dirichlet_newton(D, V, fixed_local)

    res = jnp.sqrt(
        jax.lax.psum(jnp.sum(residual * residual), AXIS) / n_dof
    )
    return dof_local[None], V[None], residual[None], res


def _btd_assemble(D, nbl, B, n_dof,
                  elements, ele_weight, targets,
                  nodes, dN, w, C, rhs, fixed, sval, dof_full):
    """Per-device assembly + Dirichlet: local elements -> (nbl, 3, B, B)
    block-tridiagonal values (one block-row halo-add), then the symmetric
    zero-one elimination.  The coords pick and the segment-sum scatter live
    here, OUTSIDE the CG program."""
    elements = elements[0]
    ele_weight = ele_weight[0]
    targets = targets[0]
    rhs = rhs[0]
    fixed = fixed[0]
    sval = sval[0]

    coords = nodes + dof_full.reshape(nodes.shape)
    dsdx, vol = assembly.gradients_and_volume(coords, elements, dN, w)
    vol = vol * ele_weight[:, None]
    Ke = assembly.element_stiffness(dsdx, vol, C)
    buf = jax.ops.segment_sum(
        Ke.reshape(-1), targets, num_segments=(nbl + 1) * 3 * B * B
    ).reshape(nbl + 1, 3, B, B)
    # halo: my (nbl)-th row block belongs to the right neighbour's block 0
    from_left = jax.lax.ppermute(
        buf[nbl], AXIS, perm=[(i, i + 1) for i in range(D - 1)]
    )
    V = buf[:nbl].at[0].add(from_left)
    V, b = _btd_dirichlet_linear(D, V, rhs, fixed, sval)
    return V[None], b[None]


def _btd_solve(D, eps, max_iters, V, b, minv=None, kind="block"):
    V = V[0]
    b = b[0]
    x, k, rmax = _btd_pcg(
        D, V, b, eps, max_iters,
        minv_blocks=None if minv is None else minv[0],
        kind=kind,
    )
    return x[None], k, rmax


class BandedShardedSolver:
    """K(dof) x = rhs on an arbitrary mesh, RCM-banded and block-row-sharded.

    Two jitted shard_map programs: (1) element-sharded assembly with a
    one-block halo-add + Dirichlet elimination, (2) the CG whose SpMV is
    three batched block matmuls -- the compiled CG contains no gather and no
    scatter (the general-mesh twin of the structured slab path).
    """

    def __init__(
        self,
        fe_mesh: FEMesh,
        material: Material,
        devices: Optional[list] = None,
        cg_eps: float = 1.0e-3,
        cg_iters: int = 0,
        block: Optional[int] = None,
        geometric_stiffness: bool = True,
        pattern=None,
        preconditioner: str = "tridiag",
        tangent: str = "secant",
    ):
        devices = devices if devices is not None else jax.devices()
        D = len(devices)
        self.device_mesh = Mesh(np.asarray(devices), (AXIS,))
        ops = build_banded_operands(
            fe_mesh, material, D, block=block, pattern=pattern
        )
        self.ops = ops
        self._material = material
        self._geometric_stiffness = geometric_stiffness
        if tangent not in ("secant", "consistent"):
            raise ValueError(
                f"banded tangent must be 'secant' or 'consistent', got "
                f"{tangent!r}"
            )
        self._tangent = tangent
        if cg_iters <= 0:
            cg_iters = ops.n_dof
        self._cg_cfg = (cg_eps, cg_iters)
        self._newton_step = None
        self._newton_step_stab = None
        # preconditioner setup (once per INCREMENT -- Newton's tangent
        # drifts slowly; CG still converges on the exact operator --
        # invalidated by new_increment()):
        #   "tridiag" (default): exact device-local block-tridiagonal solve
        #             (block Schwarz via block-Thomas, _btd_thomas_factor)
        #   "block":  block-Jacobi D_I^-1 (measured worse than scalar
        #             Jacobi on RCM-banded elasticity, kept for comparison)
        #   "jacobi": scalar 1/diag, no setup
        if preconditioner not in ("tridiag", "block", "jacobi"):
            raise ValueError(
                f"banded preconditioner must be 'tridiag', 'block' or "
                f"'jacobi', got {preconditioner!r}"
            )
        self._precond_kind = preconditioner
        self._minv_cache = None

        shard = NamedSharding(self.device_mesh, P(AXIS))
        repl = NamedSharding(self.device_mesh, P())
        self._shard = shard
        self._repl = repl
        put = lambda x, s: jax.device_put(jnp.asarray(x), s)  # noqa: E731
        self._elements = put(ops.elements, shard)
        self._ele_weight = put(ops.ele_weight, shard)
        self._targets = put(ops.scatter_targets, shard)
        self._ftargets = put(ops.force_targets, shard)
        self._iperm = put(ops.iperm, repl)
        self._nodes = put(ops.nodes, repl)
        self._dN = put(ops.dshape_gp, repl)
        self._w = put(ops.weights_gp, repl)
        self._C = put(ops.C, repl)

        from jax import shard_map

        self._assemble = jax.jit(
            shard_map(
                partial(_btd_assemble, D, ops.nbl, ops.B, ops.n_dof),
                mesh=self.device_mesh,
                in_specs=(
                    P(AXIS), P(AXIS), P(AXIS),  # elements, weight, targets
                    P(), P(), P(), P(),  # nodes, dN, w, C
                    P(AXIS), P(AXIS), P(AXIS),  # rhs, fixed, sval
                    P(),  # dof (full, replicated: assembly reads any node)
                ),
                out_specs=(P(AXIS), P(AXIS)),
                check_vma=False,
            )
        )
        self._cg = jax.jit(
            shard_map(
                partial(_btd_solve, D, *self._cg_cfg),
                mesh=self.device_mesh,
                in_specs=(P(AXIS), P(AXIS)),
                out_specs=(P(AXIS), P(), P()),
                check_vma=False,
            )
        )
        self._cg_precond = jax.jit(
            shard_map(
                partial(
                    _btd_solve, D, *self._cg_cfg, kind=self._precond_kind
                ),
                mesh=self.device_mesh,
                in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                out_specs=(P(AXIS), P(), P()),
                check_vma=False,
            )
        )
        self._factor = jax.jit(
            shard_map(
                _btd_thomas_factor
                if self._precond_kind == "tridiag"
                else _btd_block_inv,
                mesh=self.device_mesh,
                in_specs=(P(AXIS),),
                out_specs=P(AXIS),
                check_vma=False,
            )
        )

    # ------------------------------------------------------------------ #
    def _stack(self, v, fill=0.0):
        """Original-dof host vector -> permuted, padded (D, nbl*B) blocks."""
        ops = self.ops
        n_pad = ops.n_devices * ops.nbl * ops.B
        out = np.full(n_pad, fill, dtype=np.asarray(v).dtype)
        out[: ops.n_dof] = np.asarray(v)[ops.perm]
        return jax.device_put(
            jnp.asarray(out.reshape(ops.n_devices, -1)), self._shard
        )

    def solve(self, rhs: np.ndarray, fixed: np.ndarray, sval: np.ndarray,
              dof=None):
        """Assemble K(dof), eliminate Dirichlet dofs, solve K x = rhs."""
        ops = self.ops
        # padded rows are marked fixed: identity rows pinned to zero
        rhs_s = self._stack(np.asarray(rhs, dtype=float))
        fixed_s = self._stack(np.asarray(fixed, dtype=bool), fill=True)
        sval_s = self._stack(np.asarray(sval, dtype=float))
        dof_full = jnp.zeros(ops.n_dof) if dof is None else jnp.asarray(dof)
        V, b = self._assemble(
            self._elements, self._ele_weight, self._targets,
            self._nodes, self._dN, self._w, self._C,
            rhs_s, fixed_s, sval_s, dof_full,
        )
        x_s, iters, rmax = self._run_cg(V, b, fresh=True)
        xp = np.asarray(x_s).reshape(-1)[: ops.n_dof]
        x = np.empty(ops.n_dof)
        x[ops.perm] = xp
        return x, int(iters)

    def _run_cg(self, V, b, fresh: bool = False):
        """CG dispatch with the per-increment cached preconditioner setup
        (tridiag Thomas factors or block-Jacobi D_I^-1); ``fresh=True``
        recomputes the setup from this V."""
        if self._precond_kind == "jacobi":
            return self._cg(V, b)
        if fresh or self._minv_cache is None:
            self._minv_cache = self._factor(V)
        return self._cg_precond(V, b, self._minv_cache)

    def new_increment(self):
        """Invalidate the cached preconditioner setup (called by the host
        state machine at the start of every load increment)."""
        self._minv_cache = None

    # ------------------------------------------------------------------ #
    # Newton path (used by FEMSystem when SolverConfig.sharding="banded"):
    # the SAME host state machine as single-device / slab-sharded runs
    # drives these two sharded programs per iteration.  The working dof and
    # du live in the permuted (D, nbl*B) block space; the state machine's
    # dof arithmetic (boost/relax line search) is elementwise, so it works
    # on the blocks unchanged.
    # ------------------------------------------------------------------ #
    def stack(self, v) -> jax.Array:
        """Global (n_dof,) host vector -> permuted (D, nbl*B) device blocks."""
        return self._stack(np.asarray(v))

    def unstack(self, blocks) -> np.ndarray:
        """(D, nbl*B) blocks -> global (n_dof,) numpy, original ordering."""
        ops = self.ops
        xp = np.asarray(blocks).reshape(-1)[: ops.n_dof]
        x = np.empty(ops.n_dof, dtype=xp.dtype)
        x[ops.perm] = xp
        return x

    def newton_eval(self, dof_s, rhs_s, fixed_s, sval_s, stab_s=None):
        """(stacked dof, rhs, fixed, sval) -> (pinned dof, BC'd tangent
        blocks, BC'd residual blocks, rms residual) -- one sharded program.

        ``stab_s``: optional (stab_diag_s, stab_ref_s, scale) stabilization
        operands (config.stabilize_factor under sharding): stacked
        diagonal/reference blocks + a replicated (1,) scale."""
        from jax import shard_map

        ops = self.ops
        fn = partial(
            _btd_newton_eval, ops.n_devices, ops.nbl, ops.B, ops.n_dof,
            self._material, self._geometric_stiffness, self._tangent,
        )
        base_specs = (
            P(AXIS), P(AXIS), P(AXIS), P(AXIS),  # ele/wt/tgt/ftgt
            P(), P(), P(), P(), P(),  # iperm, nodes, dN, w, C
            P(AXIS), P(AXIS), P(AXIS), P(AXIS),
        )
        if stab_s is None:
            if self._newton_step is None:
                self._newton_step = jax.jit(
                    shard_map(
                        fn,
                        mesh=self.device_mesh,
                        in_specs=base_specs,
                        out_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
                        check_vma=False,
                    )
                )
            return self._newton_step(
                self._elements, self._ele_weight, self._targets,
                self._ftargets, self._iperm, self._nodes, self._dN, self._w,
                self._C, dof_s, rhs_s, fixed_s, sval_s,
            )
        if self._newton_step_stab is None:
            self._newton_step_stab = jax.jit(
                shard_map(
                    fn,
                    mesh=self.device_mesh,
                    in_specs=base_specs + (P(AXIS), P(AXIS), P()),
                    out_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
                    check_vma=False,
                )
            )
        diag_s, ref_s, scale = stab_s
        return self._newton_step_stab(
            self._elements, self._ele_weight, self._targets, self._ftargets,
            self._iperm, self._nodes, self._dN, self._w, self._C,
            dof_s, rhs_s, fixed_s, sval_s, diag_s, ref_s, scale,
        )

    def cg(self, values_s, b_s, fixed=None, fixed_s=None):
        """Sharded gather-free CG on BC'd block-tridiagonal values (the
        Newton linear solve).  fixed/fixed_s accepted for protocol parity
        with the slab solver (the banded operator is already eliminated)."""
        return self._run_cg(values_s, b_s)
