"""Mixed B31-beam + continuum models (femcy_tpu/mixed.py): one 6-dof/node
system over beam and solid blocks -- the frame-stiffened-solid capability
neither the reference (crashes on B31) nor the pure subsystems can express.

Pins: exact parity with solve_beam on beam-only models, exact parity with
FEMSystem on solid-only models, the stiffening physics of a beam spine, the
.inp front end, the *Dsload path and the CLI route.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from femcy_tpu import FEMesh, FEMSystem, SolverConfig
from femcy_tpu.beam import BeamModel, BeamSection, solve_beam
from femcy_tpu.materials import LinearIsotropic
from femcy_tpu.meshgen import cantilever_tets
from femcy_tpu.mixed import (
    BeamBlock,
    MixedModel,
    MixedSystem,
    read_mixed_inp,
    solve_mixed,
)
from femcy_tpu.multiblock import ElementBlock


def _soft_solid(mesh):
    return ElementBlock(
        elements=mesh.elements, element=mesh.element,
        material=LinearIsotropic(modulus=10.0, poisson_ratio=0.3),
        name="solid",
    )


def _spine(mesh):
    """Beam elements along the bar's top edge (y = z = thickness)."""
    top = np.nonzero(
        (mesh.nodes[:, 1] > mesh.nodes[:, 1].max() - 1e-9)
        & (mesh.nodes[:, 2] > mesh.nodes[:, 2].max() - 1e-9)
    )[0]
    spine = top[np.argsort(mesh.nodes[top, 0])]
    elems = np.stack([spine[:-1], spine[1:]], axis=1).astype(np.int32)
    return spine, BeamBlock(
        elements=elems, section=BeamSection.rect(0.2, 0.2),
        E=2.0e5, nu=0.3, name="spine",
    )


def test_beam_only_matches_solve_beam():
    """A mixed system with only beam blocks IS the beam subsystem."""
    n = 9
    nodes = np.zeros((n, 3))
    nodes[:, 0] = np.linspace(0.0, 8.0, n)
    elems = np.stack(
        [np.arange(n - 1), np.arange(1, n)], axis=1
    ).astype(np.int32)
    sec = BeamSection.rect(0.3, 0.5)
    bres = solve_beam(
        BeamModel(
            nodes=nodes, elements=elems, section=sec, E=2.0e5, nu=0.3,
            dirichlet=[(0, d, 0.0) for d in range(6)],
            loads=[(n - 1, 2, -1.0), (n - 1, 4, 0.5)],
        )
    )
    res = solve_mixed(
        MixedModel(
            nodes=nodes, solid_blocks=[],
            beam_blocks=[BeamBlock(elems, sec, 2.0e5, 0.3)],
            dirichlet=[(0, d, 0.0) for d in range(6)],
            cloads=[(n - 1, 2, -1.0), (n - 1, 4, 0.5)],
            neumann_bcs=[],
        )
    )
    err = np.abs(res.u - bres.u).max() / np.abs(bres.u).max()
    assert err < 1e-10, err
    ferr = np.abs(
        np.asarray(res.beam_end_forces[0]) - bres.end_forces
    ).max() / np.abs(bres.end_forces).max()
    assert ferr < 1e-10, ferr
    assert res.n_auto_fixed == 0


def test_solid_only_matches_femsystem():
    """A mixed system with only continuum blocks reproduces FEMSystem's
    translations exactly; every rotation dof is auto-constrained."""
    from femcy_tpu import bc as bc_mod

    mesh, fixed_nodes, loaded = cantilever_tets(6, 2)
    blk = _soft_solid(mesh)
    cloads = [(int(nid), 1, -0.5) for nid in loaded]
    res = solve_mixed(
        MixedModel(
            nodes=mesh.nodes, solid_blocks=[blk], beam_blocks=[],
            dirichlet=[(int(n), d, 0.0) for n in fixed_nodes
                       for d in range(3)],
            cloads=cloads, neumann_bcs=[],
        )
    )
    assert res.n_auto_fixed == 3 * mesh.n_nodes
    assert np.abs(res.u[:, 3:]).max() == 0.0

    system = FEMSystem(mesh, blk.material, False)
    fixed = np.zeros(mesh.n_dof, dtype=bool)
    for d in range(3):
        fixed[fixed_nodes * 3 + d] = True
    rhs = np.zeros(mesh.n_dof)
    for (nid, dof, val) in cloads:
        rhs[nid * 3 + dof] += val
    values, b, _ = system._jit_linear_system(
        system._arrs, jnp.asarray(rhs), jnp.asarray(fixed),
        jnp.zeros(mesh.n_dof),
    )
    u_ref = np.asarray(
        system._solve_linear_system(values, b, jnp.asarray(fixed))
    ).reshape(-1, 3)
    err = np.abs(res.u[:, :3] - u_ref).max() / np.abs(u_ref).max()
    assert err < 1e-9, err


def test_beam_spine_stiffens_solid():
    """The frame-stiffened solid: a stiff beam spine on a soft bar cuts the
    tip deflection by an order of magnitude, and the beam carries bending
    moment (the coupling is real, not just shared supports)."""
    mesh, fixed_nodes, loaded = cantilever_tets(
        10, 2, length=10.0, thickness=1.0
    )
    blk = _soft_solid(mesh)
    spine, bb = _spine(mesh)
    cloads = [(int(n), 2, -1.0 / len(loaded)) for n in loaded]
    base = MixedModel(
        nodes=mesh.nodes, solid_blocks=[blk], beam_blocks=[],
        dirichlet=[(int(n), d, 0.0) for n in fixed_nodes for d in range(3)],
        cloads=cloads, neumann_bcs=[],
    )
    tip0 = solve_mixed(base).u[loaded, 2].mean()
    stiffened = MixedModel(
        nodes=mesh.nodes, solid_blocks=[blk], beam_blocks=[bb],
        dirichlet=[(int(n), d, 0.0) for n in fixed_nodes for d in range(6)],
        cloads=cloads, neumann_bcs=[],
    )
    res = solve_mixed(stiffened)
    tip1 = res.u[loaded, 2].mean()
    assert abs(tip1) < 0.2 * abs(tip0), (tip0, tip1)
    moments = np.abs(np.asarray(res.beam_end_forces[0])[:, [4, 5, 10, 11]])
    assert moments.max() > 0.0
    # only non-spine nodes' rotations are auto-constrained
    assert res.n_auto_fixed == 3 * (mesh.n_nodes - len(spine))


def test_dsload_traction_on_solid_skin():
    """*Dsload tractions integrate on the continuum skin and restride into
    the 6-dof layout (translations only)."""
    from femcy_tpu.io.inp import NeumannBC

    mesh, fixed_nodes, loaded = cantilever_tets(6, 2)
    blk = _soft_solid(mesh)
    lset = set(loaded.tolist())
    faces = [f for f in mesh.boundary if all(n in lset for n in f)]
    model = MixedModel(
        nodes=mesh.nodes, solid_blocks=[blk], beam_blocks=[],
        dirichlet=[(int(n), d, 0.0) for n in fixed_nodes for d in range(3)],
        cloads=[],
        neumann_bcs=[NeumannBC(face_set=faces, traction=2.0,
                               direction=np.array([0.0, 0.0, 1.0]))],
    )
    res = solve_mixed(model)
    assert np.isfinite(res.u).all()
    # the loaded face moves in +z
    assert res.u[loaded, 2].mean() > 0.0


MIXED_INP = """*Node
1, 0., 0., 0.
2, 1., 0., 0.
3, 0., 1., 0.
4, 0., 0., 1.
5, 1., 1., 0.
6, 2., 0.5, 0.5
7, 3., 0.5, 0.5
*Element, type=C3D4, elset=solid
1, 1, 2, 3, 4
2, 2, 5, 3, 4
*Element, type=B31, elset=frame
3, 2, 6
4, 6, 7
*Nset, nset=fix
1, 3, 4
*Nset, nset=tip
7,
*Material, name=steel
*Elastic
200., 0.3
*Beam Section, elset=frame, section=RECT, material=steel
0.2, 0.2
*Boundary
fix, 1, 3, 0.
*Cload
tip, 3, -0.01
*Step
*Static
1., 1., 1e-5, 1.
*End Step
"""


def test_read_mixed_inp_and_solve(tmp_path):
    path = tmp_path / "mixed.inp"
    path.write_text(MIXED_INP)
    model = read_mixed_inp(str(path))
    assert len(model.solid_blocks) == 1 and len(model.beam_blocks) == 1
    assert model.beam_blocks[0].elements.shape == (2, 2)
    assert model.cloads == [(6, 2, -0.01)]
    res = solve_mixed(model)
    assert np.isfinite(res.u).all()
    # the cantilevered frame tip deflects down
    assert res.u[6, 2] < 0.0
    # moments flow through the beam
    assert np.abs(np.asarray(res.beam_end_forces[0])[:, [4, 5, 10, 11]]).max() > 0


def test_cli_routes_mixed_models(tmp_path, capsys):
    from femcy_tpu.cli import main as cli_main

    path = tmp_path / "mixed.inp"
    path.write_text(MIXED_INP)
    rc = cli_main([str(path), "--platform", "cpu"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "mixed model" in out and "B31" in out
    assert "max deflection" in out
