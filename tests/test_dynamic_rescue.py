"""Implicit-dynamics snap traversal (config.dynamic_rescue).

When a static increment fails at the minimum dt because the structure
SNAPS -- the tangent is positive definite at the last converged state,
nothing inverts, yet Newton diverges for arbitrarily small dt: no nearby
static equilibrium exists -- the rescue holds the loads just past the
failure point, gives the mesh a unit-density lumped mass, integrates
Newmark-beta with numerical dissipation until the kinetic energy decays,
polishes with a pure static Newton solve, and resumes the schedule on the
far side.  The reference has no counterpart: its only answer is dt cutback
(stiffnessMtrx.py:693-701), which cannot cross a snap (measured: viscous
stabilization cannot either, see PARITY.md).

The fixture is a classic hard snap-through: a slender shallow circular
arch (span 100, rise 8, thickness 0.8), hinged at the mid-thickness end
nodes, under uniform downward pressure.  At P = 0.2 the limit point sits
at ~2.8% of the schedule and the post-buckling jump is large enough that
load-stepped Newton fails at ANY dt (the within-increment-snap
diagnosis), while the inverted configuration carries the full load.
"""

import numpy as np
import pytest

from femcy_tpu import FEMesh, FEMSystem, SolverConfig
from femcy_tpu.io.inp import DirichletBC, InpModel, NeumannBC
from femcy_tpu.materials import material_from_inp

RISE = 8.0


def _arch_inp(pressure=-0.2, nx=64, ny=2, span=100.0, rise=RISE, thick=0.8):
    radius = (span / 2) ** 2 / (2 * rise) + rise / 2
    th0 = np.arcsin((span / 2) / radius)
    nodes = np.zeros(((nx + 1) * (ny + 1), 2))

    def nid(i, j):
        return j * (nx + 1) + i

    for j in range(ny + 1):
        r = radius - thick / 2 + thick * j / ny
        for i in range(nx + 1):
            phi = -th0 + 2 * th0 * i / nx
            nodes[nid(i, j)] = [r * np.sin(phi), r * np.cos(phi)]
    elems = np.asarray(
        [
            [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)]
            for j in range(ny)
            for i in range(nx)
        ],
        dtype=np.int32,
    )
    # hinge: pin only the mid-thickness end nodes
    ends = np.array([nid(0, ny // 2), nid(nx, ny // 2)])
    bcs = [DirichletBC(ends, 0, 0.0), DirichletBC(ends, 1, 0.0)]
    top = [tuple(sorted((nid(i, ny), nid(i + 1, ny)))) for i in range(nx)]
    return InpModel(
        nodes=nodes,
        elements=elems,
        element_type="CPE4",
        node_sets={},
        ele_sets={},
        face_sets={},
        dirichlet_bcs=bcs,
        neumann_bcs=[NeumannBC(face_set=top, traction=pressure, direction=None)],
        material_type="Elastic",
        material_params=[1000.0, 0.3],
        geometric_nonlinear=True,
        time_incs=dict(ini_inc=0.05, max_time=1.0, min_inc=1e-5, max_inc=0.1),
    )


def _solve(rescue: bool):
    inp = _arch_inp()
    mat = material_from_inp(
        inp.material_type, inp.material_params, inp.element_type
    )
    system = FEMSystem(
        FEMesh(inp.nodes, inp.elements, inp.element),
        mat,
        True,
        SolverConfig(tangent="consistent", dynamic_rescue=rescue),
    )
    return system, system.solve(inp)


@pytest.fixture(scope="module")
def static_run():
    return _solve(rescue=False)


@pytest.fixture(scope="module")
def rescued_run():
    return _solve(rescue=True)


def test_static_newton_cannot_cross_the_snap(static_run):
    """The control: load-stepped Newton aborts early with the
    within-increment-snap diagnosis (positive-definite tangent, no
    inversion, divergence at any dt)."""
    system, report = static_run
    assert not report.success
    assert system.time0 < 0.1  # fails near the limit point, ~2.8%
    assert "WITHIN the increment" in report.message
    assert "inversion" not in report.message.split(";")[0]


def test_dynamic_rescue_crosses_and_completes(static_run, rescued_run):
    """With dynamic_rescue the same analysis traverses the snap and
    completes the schedule on the inverted branch."""
    system, report = rescued_run
    assert report.success
    assert system.time0 == 1.0
    uy = np.asarray(system.dof).reshape(-1, 2)[:, 1]
    # the apex ends up BELOW the chord: snapped through (> 2x the rise)
    assert uy.min() < -2 * RISE
    # the rescue happened past the static failure point
    t_fail = static_run[0].time0
    assert any(
        r.converged and r.time > t_fail for r in report.increments
    )


def test_rescued_state_is_a_static_equilibrium(rescued_run):
    """The far side is genuine statics: re-running the last load level as a
    pure static resume converges with zero further displacement change."""
    system, _ = rescued_run
    inp = _arch_inp()
    dof_end = np.asarray(system.dof).copy()
    system.config = SolverConfig(tangent="consistent", dynamic_rescue=False)
    system.dt = 0.05
    report2 = system.solve(inp, resume=True)  # time0 == max_time: no-op OK
    assert report2.success
    np.testing.assert_allclose(
        np.asarray(system.dof), dof_end, rtol=0, atol=1e-9
    )


def test_dynamic_rescue_default_off():
    assert SolverConfig().dynamic_rescue is False


def test_dynamic_rescue_under_banded_sharding(rescued_run):
    """dynamic_rescue composes with sharding='banded': the Newmark inertia
    term rides the same stab_* operands the sharded newton_evals already
    implement, so the full snap-through analysis runs multi-chip and lands
    on the single-device answer (the last r3 nonlinear/multi-chip
    incompatibility)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest XLA_FLAGS)")
    inp = _arch_inp()
    mat = material_from_inp(
        inp.material_type, inp.material_params, inp.element_type
    )
    system = FEMSystem(
        FEMesh(inp.nodes, inp.elements, inp.element),
        mat,
        True,
        # 4x n_dof CG cap: the thin-arch block-tridiagonal operator is too
        # ill-conditioned for block-Jacobi PCG to finish inside the n_dof
        # default on a few Newmark steps near the snap
        SolverConfig(tangent="consistent", dynamic_rescue=True,
                     sharding="banded", sharding_devices=8,
                     cg_max_iters=4 * inp.nodes.size),
    )
    report = system.solve(inp)
    assert report.success
    assert system.time0 == 1.0
    uy = np.asarray(system.dof).reshape(-1, 2)[:, 1]
    assert uy.min() < -2 * RISE
    # same inverted equilibrium as the single-device rescue
    uy_single = np.asarray(rescued_run[0].dof).reshape(-1, 2)[:, 1]
    np.testing.assert_allclose(uy.min(), uy_single.min(), rtol=1e-6)


def test_multiblock_dynamic_rescue():
    """The rescue is shared with MultiBlockSystem (duck-typed Newmark
    integrator): the same arch split into two same-type blocks at midspan
    snaps through and completes, matching the single-block answer."""
    from femcy_tpu.elements import get_element
    from femcy_tpu.multiblock import ElementBlock, MultiBlockSystem

    inp = _arch_inp()
    mat = material_from_inp(
        inp.material_type, inp.material_params, inp.element_type
    )
    half = len(inp.elements) // 2
    system = MultiBlockSystem(
        inp.nodes,
        [
            ElementBlock(inp.elements[:half], get_element("CPE4"), mat, "l"),
            ElementBlock(inp.elements[half:], get_element("CPE4"), mat, "r"),
        ],
        SolverConfig(tangent="consistent", dynamic_rescue=True),
    )
    report = system.solve_nonlinear(inp)
    assert report.success
    uy = np.asarray(system.dof).reshape(-1, 2)[:, 1]
    assert uy.min() < -2 * RISE
