"""Device-resident analysis loop (config.device_loop) vs the host state
machine: identical increments, iterations and solutions.

The device loop compiles the whole adaptive-stepping Newton analysis
(system.py solve/_advance_inc/run_newton, which mirrors the reference
stiffnessMtrx.py:647-822) into one XLA program; these tests pin its
semantics to the host loop increment-for-increment, including the dt
cutback/growth machine and the relaxation backtracking.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from femcy_tpu import FEMesh, FEMSystem, SolverConfig, read_inp
from femcy_tpu.materials import material_from_inp


BASE = dict(
    tangent="consistent",
    newton_boost_max=0,
    linear_solver="cg",
    dense_operator_max_dof=8192,
)


@pytest.fixture(scope="module")
def twist_c3d4(fixtures_dir):
    inp = read_inp(str(fixtures_dir / "twist" / "twist_plate_C3D4.inp"))
    mat = material_from_inp(
        inp.material_type, inp.material_params, inp.element_type
    )
    mesh = FEMesh(inp.nodes, inp.elements, inp.element)
    return inp, mesh, mat


def _run(inp, mesh, mat, **cfg_kw):
    system = FEMSystem(mesh, mat, True, config=SolverConfig(**BASE, **cfg_kw))
    report = system.solve(inp)
    return system, report


def test_matches_host_loop(twist_c3d4):
    """Same schedule, same iteration counts, same dofs as the host loop."""
    inp, mesh, mat = twist_c3d4
    inp.time_incs = dict(
        inp.time_incs, max_time=0.25, max_inc=0.05, ini_inc=0.025
    )
    sys_h, rep_h = _run(inp, mesh, mat)
    sys_d, rep_d = _run(inp, mesh, mat, device_loop=True)
    assert rep_d.success and rep_h.success
    assert rep_d.n_increments == rep_h.n_increments
    for rh, rd in zip(rep_h.increments, rep_d.increments):
        assert rd.converged == rh.converged
        assert rd.newton_iters == rh.newton_iters
        assert rd.time == pytest.approx(rh.time, abs=1e-12)
        assert rd.dt == pytest.approx(rh.dt, abs=1e-12)
    scale = float(jnp.max(jnp.abs(sys_h.dof)))
    err = float(jnp.max(jnp.abs(sys_h.dof - sys_d.dof))) / scale
    assert err < 1e-8
    # post-state bookkeeping for downstream observables
    assert sys_d.time0 == pytest.approx(0.25)
    assert abs(sys_d.elastic_energy() - sys_h.elastic_energy()) <= (
        1e-6 * abs(sys_h.elastic_energy())
    )


def test_cutback_parity(twist_c3d4):
    """A too-large first increment must cut dt back identically to the
    host machine (ref: stiffnessMtrx.py:692-701)."""
    inp, mesh, mat = twist_c3d4
    inp.time_incs = dict(
        inp.time_incs, max_time=0.3, max_inc=0.3, ini_inc=0.3, min_inc=1e-4
    )
    # a tight iteration cap forces the first attempt to fail -> dt/4
    sys_h, rep_h = _run(inp, mesh, mat, newton_max_iters=3)
    sys_d, rep_d = _run(inp, mesh, mat, newton_max_iters=3, device_loop=True)
    assert rep_d.success == rep_h.success
    # the failed attempts are recorded on both paths
    conv_h = [r.converged for r in rep_h.increments]
    conv_d = [r.converged for r in rep_d.increments]
    assert conv_d == conv_h
    assert not all(conv_h), "fixture no longer triggers a cutback"
    scale = float(jnp.max(jnp.abs(sys_h.dof)))
    err = float(jnp.max(jnp.abs(sys_h.dof - sys_d.dof))) / scale
    assert err < 1e-8


def test_matches_host_loop_reference_defaults(twist_c3d4):
    """The reference-parity default config -- secant tangent + boost line
    search (stiffnessMtrx.py:792-807) -- runs device-resident and matches
    the host machine increment-for-increment."""
    inp, mesh, mat = twist_c3d4
    inp.time_incs = dict(
        inp.time_incs, max_time=0.25, max_inc=0.05, ini_inc=0.025
    )
    kw = dict(
        tangent="secant", newton_boost_max=10,
        linear_solver="cg", dense_operator_max_dof=8192,
    )
    sys_h = FEMSystem(mesh, mat, True, config=SolverConfig(**kw))
    rep_h = sys_h.solve(inp)
    sys_d = FEMSystem(
        mesh, mat, True, config=SolverConfig(**kw, device_loop=True)
    )
    rep_d = sys_d.solve(inp)
    assert rep_d.success and rep_h.success
    assert rep_d.n_increments == rep_h.n_increments
    for rh, rd in zip(rep_h.increments, rep_d.increments):
        assert rd.converged == rh.converged
        assert rd.newton_iters == rh.newton_iters
        assert rd.time == pytest.approx(rh.time, abs=1e-12)
        assert rd.dt == pytest.approx(rh.dt, abs=1e-12)
    # identical schedule + iteration counts; the converged dofs differ by
    # O(newton_rel_tol * last-step size) because the device boost keeps the
    # exact pre-step state where the host round-trips (dof-x)+x in fp --
    # both are valid iterates of the same 1%-tolerance Newton
    scale = float(jnp.max(jnp.abs(sys_h.dof)))
    err = float(jnp.max(jnp.abs(sys_h.dof - sys_d.dof))) / scale
    assert err < 1e-5


def test_matches_host_loop_extrapolate_globalref(twist_c3d4):
    """predictor='extrapolate' + newton_residual_ref='global' (the
    reference's process-lifetime ini_residual quirk,
    stiffnessMtrx.py:760-762) run device-resident with host parity."""
    inp, mesh, mat = twist_c3d4
    inp.time_incs = dict(
        inp.time_incs, max_time=0.25, max_inc=0.05, ini_inc=0.025
    )
    kw = dict(predictor="extrapolate", newton_residual_ref="global")
    sys_h, rep_h = _run(inp, mesh, mat, **kw)
    sys_d, rep_d = _run(inp, mesh, mat, device_loop=True, **kw)
    assert rep_d.success and rep_h.success
    assert rep_d.n_increments == rep_h.n_increments
    for rh, rd in zip(rep_h.increments, rep_d.increments):
        assert rd.converged == rh.converged
        assert rd.newton_iters == rh.newton_iters
        assert rd.time == pytest.approx(rh.time, abs=1e-12)
    scale = float(jnp.max(jnp.abs(sys_h.dof)))
    err = float(jnp.max(jnp.abs(sys_h.dof - sys_d.dof))) / scale
    assert err < 1e-6
    # the process-lifetime cache crossed back to the host side
    assert sys_d._ini_residual == pytest.approx(
        sys_h._ini_residual, rel=1e-9
    )


def test_unsupported_configs_raise(twist_c3d4):
    inp, mesh, mat = twist_c3d4
    for bad in (
        dict(stabilize_factor=1e-4),
        dict(dynamic_rescue=True),
        dict(mixed_precision_refine=True),
    ):
        kw = dict(BASE, device_loop=True)
        kw.update(bad)
        system = FEMSystem(mesh, mat, True, config=SolverConfig(**kw))
        with pytest.raises(ValueError, match="device_loop"):
            system.solve(inp)


def test_linear_analysis_raises(twist_c3d4):
    inp, mesh, mat = twist_c3d4
    system = FEMSystem(
        mesh, mat, False, config=SolverConfig(**BASE, device_loop=True)
    )
    with pytest.raises(ValueError, match="device_loop"):
        system.solve(inp)
