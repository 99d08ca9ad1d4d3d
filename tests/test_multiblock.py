"""Multi-element-type / multi-material models (femcy_tpu.multiblock).

The reference crashes on these (inp_info.py:125-128: one element type, one
material).  The patch test is the canonical correctness bar: a mixed-type
mesh must reproduce a uniform stress state EXACTLY, and a two-material bar
must match the series-spring solution.
"""

import numpy as np
import pytest

from femcy_tpu import (
    ElementBlock,
    MultiBlockSystem,
    SolverConfig,
    read_inp_multi,
    system_from_model,
)
from femcy_tpu.elements import get_element
from femcy_tpu.materials import LinearIsotropicPlaneStress


def _mixed_rect(nx=4, ny=2, lx=2.0, ly=1.0):
    """[0,lx]x[0,ly] grid: left half CPS4 quads, right half CPS3 triangles.

    Returns (nodes, quads, tris, interface x index).
    """
    xs = np.linspace(0.0, lx, nx + 1)
    ys = np.linspace(0.0, ly, ny + 1)
    nodes = np.array([[x, y] for x in xs for y in ys])

    def nid(i, j):
        return i * (ny + 1) + j

    quads, tris = [], []
    for i in range(nx):
        for j in range(ny):
            a, b, c, d = nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)
            if i < nx // 2:
                quads.append([a, b, c, d])
            else:
                tris.append([a, b, c])
                tris.append([a, c, d])
    return (
        nodes,
        np.asarray(quads, np.int32),
        np.asarray(tris, np.int32),
        nx // 2,
    )


def test_mixed_type_patch_test():
    """Uniform uniaxial stretch over a CPS4+CPS3 mixed mesh: every Gauss
    point of BOTH blocks must carry the exact constant stress."""
    nodes, quads, tris, _ = _mixed_rect()
    mat = LinearIsotropicPlaneStress(100.0, 0.3)
    system = MultiBlockSystem(
        nodes,
        [
            ElementBlock(quads, get_element("CPS4"), mat, "quads"),
            ElementBlock(tris, get_element("CPS3"), mat, "tris"),
        ],
    )
    n_dof = system.n_dof
    fixed = np.zeros(n_dof, bool)
    sval = np.zeros(n_dof)
    left = np.nonzero(nodes[:, 0] < 1e-12)[0]
    right = np.nonzero(nodes[:, 0] > 2.0 - 1e-12)[0]
    fixed[left * 2] = True
    fixed[right * 2] = True
    sval[right * 2] = 0.02
    fixed[0 * 2 + 1] = True  # pin one uy to kill the rigid mode
    system.solve(np.zeros(n_dof), fixed, sval)

    eps_xx = 0.02 / 2.0
    sigma_ref = 100.0 * eps_xx  # plane stress, free lateral contraction
    for bi in range(2):
        _, stress, mises = system.block_stress(bi)
        sxx = np.asarray(stress)[:, :, 0, 0]
        syy = np.asarray(stress)[:, :, 1, 1]
        np.testing.assert_allclose(sxx, sigma_ref, rtol=1e-9)
        np.testing.assert_allclose(syy, 0.0, atol=1e-9 * sigma_ref)


def test_two_material_series_bar():
    """Left half E=100, right half E=300 (nu=0): interface displacement and
    the uniform stress match the series-spring solution."""
    nodes, quads, tris, mid = _mixed_rect()
    m1 = LinearIsotropicPlaneStress(100.0, 0.0)
    m2 = LinearIsotropicPlaneStress(300.0, 0.0)
    system = MultiBlockSystem(
        nodes,
        [
            ElementBlock(quads, get_element("CPS4"), m1, "soft"),
            ElementBlock(tris, get_element("CPS3"), m2, "stiff"),
        ],
    )
    n_dof = system.n_dof
    fixed = np.zeros(n_dof, bool)
    sval = np.zeros(n_dof)
    left = np.nonzero(nodes[:, 0] < 1e-12)[0]
    right = np.nonzero(nodes[:, 0] > 2.0 - 1e-12)[0]
    interface = np.nonzero(np.abs(nodes[:, 0] - 1.0) < 1e-12)[0]
    fixed[left * 2] = True
    fixed[right * 2] = True
    sval[right * 2] = 0.03
    fixed[0 * 2 + 1] = True
    dof = np.asarray(system.solve(np.zeros(n_dof), fixed, sval))

    # series springs over equal lengths: eps1*E1 = eps2*E2, eps1+eps2 = 0.03
    eps2 = 0.03 / (1.0 + 300.0 / 100.0)
    eps1 = 3.0 * eps2
    np.testing.assert_allclose(dof[interface * 2], eps1, rtol=1e-9)
    sigma = 100.0 * eps1
    for bi, _E in enumerate([100.0, 300.0]):
        _, stress, _ = system.block_stress(bi)
        np.testing.assert_allclose(
            np.asarray(stress)[:, :, 0, 0], sigma, rtol=1e-9
        )


MIXED_INP = """*Heading
synthetic mixed-type two-material model
*Node
{nodes}
*Element, type=CPS4, elset=soft
{quads}
*Element, type=CPS3, elset=stiff
{tris}
*Nset, nset=left, instance=Part-1-1
{left}
*Nset, nset=right, instance=Part-1-1
{right}
*Solid Section, elset=soft, material=rubber
*Solid Section, elset=stiff, material=steel
*Material, name=rubber
*Elastic
100., 0.
*Material, name=steel
*Elastic
300., 0.
*Step
*Static
1., 1., 1e-05, 1.
*Boundary
left, 1, 1
*End Step
"""


def test_read_inp_multi_roundtrip(tmp_path):
    """A synthetic two-block two-material .inp parses into the right blocks
    and solves to the same answer as the directly-constructed system."""
    nodes, quads, tris, _ = _mixed_rect()
    txt = MIXED_INP.format(
        nodes="\n".join(
            f"{i + 1}, {x}, {y}" for i, (x, y) in enumerate(nodes)
        ),
        quads="\n".join(
            f"{i + 1}, " + ", ".join(str(n + 1) for n in e)
            for i, e in enumerate(quads)
        ),
        tris="\n".join(
            f"{100 + i}, " + ", ".join(str(n + 1) for n in e)
            for i, e in enumerate(tris)
        ),
        left=", ".join(
            str(i + 1) for i in np.nonzero(nodes[:, 0] < 1e-12)[0]
        ),
        right=", ".join(
            str(i + 1) for i in np.nonzero(nodes[:, 0] > 2.0 - 1e-12)[0]
        ),
    )
    path = tmp_path / "mixed.inp"
    path.write_text(txt)

    model = read_inp_multi(str(path))
    assert [b[0] for b in model.element_blocks] == ["CPS4", "CPS3"]
    assert model.sections == {"soft": "rubber", "stiff": "steel"}
    assert model.materials["rubber"][1][0] == 100.0
    assert model.materials["steel"][1][0] == 300.0
    np.testing.assert_array_equal(model.element_blocks[0][2], quads)
    np.testing.assert_array_equal(model.element_blocks[1][2], tris)

    system = system_from_model(model)
    assert system.blocks[0].material.modulus == 100.0
    assert system.blocks[1].material.modulus == 300.0
    n_dof = system.n_dof
    fixed = np.zeros(n_dof, bool)
    sval = np.zeros(n_dof)
    right = np.nonzero(nodes[:, 0] > 2.0 - 1e-12)[0]
    for b in model.dirichlet_bcs:
        fixed[b.node_set * 2 + b.dof] = True
        sval[b.node_set * 2 + b.dof] = b.value
    fixed[right * 2] = True
    sval[right * 2] = 0.03
    fixed[1] = True
    dof = np.asarray(system.solve(np.zeros(n_dof), fixed, sval))
    interface = np.nonzero(np.abs(nodes[:, 0] - 1.0) < 1e-12)[0]
    eps1 = 3.0 * 0.03 / 4.0
    np.testing.assert_allclose(dof[interface * 2], eps1, rtol=1e-9)


def test_multiblock_rejects_mixed_dimensionality():
    nodes, quads, _, _ = _mixed_rect()
    mat = LinearIsotropicPlaneStress(100.0, 0.3)
    from femcy_tpu.materials import LinearIsotropic

    with pytest.raises(ValueError, match="dimensionalities"):
        MultiBlockSystem(
            nodes,
            [
                ElementBlock(quads, get_element("CPS4"), mat),
                ElementBlock(
                    np.zeros((1, 4), np.int32),
                    get_element("C3D4"),
                    LinearIsotropic(1.0, 0.3),
                ),
            ],
        )


def test_multiblock_cg_matches_direct():
    nodes, quads, tris, _ = _mixed_rect(6, 4)
    mat = LinearIsotropicPlaneStress(200.0, 0.25)
    blocks = [
        ElementBlock(quads, get_element("CPS4"), mat),
        ElementBlock(tris, get_element("CPS3"), mat),
    ]
    n_dof = nodes.shape[0] * 2
    fixed = np.zeros(n_dof, bool)
    sval = np.zeros(n_dof)
    left = np.nonzero(nodes[:, 0] < 1e-12)[0]
    fixed[left * 2] = True
    fixed[left * 2 + 1] = True
    rhs = np.zeros(n_dof)
    right = np.nonzero(nodes[:, 0] > 2.0 - 1e-12)[0]
    rhs[right * 2 + 1] = 1.0

    d = MultiBlockSystem(nodes, blocks, SolverConfig(linear_solver="direct"))
    x_direct = np.asarray(d.solve(rhs, fixed, sval))
    c = MultiBlockSystem(
        nodes, blocks, SolverConfig(linear_solver="cg", cg_eps=1e-12)
    )
    x_cg = np.asarray(c.solve(rhs, fixed, sval))
    scale = np.abs(x_direct).max()
    np.testing.assert_allclose(x_cg / scale, x_direct / scale, atol=1e-9)


NEUMANN_INP = """*Heading
mixed-type two-material model loaded by a *Dsload surface traction
*Node
{nodes}
*Element, type=CPS4, elset=soft
{quads}
*Element, type=CPS3, elset=stiff
{tris}
*Nset, nset=left, instance=Part-1-1
{left}
*Elset, elset=rightcol, instance=Part-1-1
{rightcol}
*Surface, type=ELEMENT, name=surfR
rightcol, S2
*Solid Section, elset=soft, material=rubber
*Solid Section, elset=stiff, material=steel
*MATERIAL, NAME=rubber
*Elastic
100., 0.
*MATERIAL, NAME=steel
*Elastic
300., 0.
*Step
*Static
1., 1., 1e-05, 1.
*Boundary
left, 1, 1
left, 2, 2
*Dsload
surfR, P, 5., 1., 0., 0.
*End Step
"""


def _write_mixed_neumann_inp(path, nlgeom_no=False):
    """Write the two-material CPS4+CPS3 series bar under an end traction."""
    nx, ny = 4, 2
    nodes, quads, tris, _ = _mixed_rect(nx, ny)
    nq = len(quads)
    right_tris = [((nx - 1 - nx // 2) * ny + j) * 2 for j in range(ny)]
    txt = NEUMANN_INP.format(
        nodes="\n".join(
            f"{i + 1}, {x}, {y}" for i, (x, y) in enumerate(nodes)
        ),
        quads="\n".join(
            f"{i + 1}, " + ", ".join(str(n + 1) for n in e)
            for i, e in enumerate(quads)
        ),
        tris="\n".join(
            f"{nq + i + 1}, " + ", ".join(str(n + 1) for n in e)
            for i, e in enumerate(tris)
        ),
        left=", ".join(
            str(i + 1) for i in np.nonzero(nodes[:, 0] < 1e-12)[0]
        ),
        rightcol=", ".join(str(nq + i + 1) for i in right_tris),
    )
    if nlgeom_no:
        txt = txt.replace("*Step", "*Step, nlgeom=NO", 1)
    path.write_text(txt)
    return nodes


def test_cli_multiblock_end_to_end(tmp_path, capsys):
    """The CLI auto-routes mixed-type/mixed-material .inp models to the
    multi-block system and prints the single-block observables; PNG and
    mixed-cell VTK exports are written."""
    from femcy_tpu.cli import main as cli_main

    inp = tmp_path / "mixed.inp"
    _write_mixed_neumann_inp(inp, nlgeom_no=True)
    png, vtk = tmp_path / "out.png", tmp_path / "out.vtk"
    html = tmp_path / "out.html"
    rc = cli_main(
        [
            str(inp),
            "--stress", "0",
            "--save-png", str(png),
            "--save-vtk", str(vtk),
            "--save-html", str(html),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "2 material(s)" in out
    assert "4 CPS4[soft], 8 CPS3[stiff]" in out
    sxx = float(
        [l for l in out.splitlines() if "max nodal stress[00]" in l][0]
        .split("=")[1]
    )
    np.testing.assert_allclose(sxx, 5.0, rtol=1e-6)  # series bar: sxx = t
    u = float(
        [l for l in out.splitlines() if "max |dof|" in l][0].split("=")[1]
    )
    np.testing.assert_allclose(u, 5.0 / 100.0 + 5.0 / 300.0, rtol=1e-6)
    assert png.exists() and png.stat().st_size > 10_000
    text = vtk.read_text()
    assert "CELL_TYPES 12" in text
    # 4 quads (VTK type 9) then 8 triangles (type 5) in one grid
    cells = text.split("CELL_TYPES 12\n")[1].splitlines()[:12]
    assert cells == ["9"] * 4 + ["5"] * 8
    # HTML viewer: one scene holding BOTH blocks' surface triangles
    import json
    import re

    data = json.loads(
        re.search(r"const D=(\{.*?\});", html.read_text()).group(1)
    )
    from femcy_tpu.mesh import FEMesh
    from femcy_tpu.elements import get_element

    nodes, quads, tris_conn, _ = _mixed_rect(4, 2)
    expect = (
        FEMesh(nodes, quads, get_element("CPS4")).surface_triangles[0].shape[0]
        + FEMesh(nodes, tris_conn, get_element("CPS3"))
        .surface_triangles[0]
        .shape[0]
    )
    assert len(data["tri"]) // 3 == expect
    assert len(data["col"]) == expect


def test_cli_multiblock_nonlinear(tmp_path, capsys):
    """The CLI runs geometric-nonlinear multi-block analyses end-to-end
    (previously rejected with 'linear analyses only')."""
    from femcy_tpu.cli import main as cli_main

    inp = tmp_path / "mixed_nl.inp"
    _write_mixed_neumann_inp(inp, nlgeom_no=False)  # bare *Step => nlgeom
    rc = cli_main([str(inp), "--stress", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "geometric_nonlinear=True" in out
    assert "converged" in out
    # nu=0 series bar under end traction 5: the small-strain answer is
    # sxx = 5 everywhere; finite-deformation corrections stay ~1%
    sxx = float(
        [l for l in out.splitlines() if "max |stress[00]|" in l][0]
        .split("=")[1]
    )
    np.testing.assert_allclose(sxx, 5.0, rtol=2e-2)
    u = float(
        [l for l in out.splitlines() if "max |dof|" in l][0].split("=")[1]
    )
    np.testing.assert_allclose(u, 5.0 / 100.0 + 5.0 / 300.0, rtol=8e-2)


def test_nonlinear_single_block_matches_femsystem(tmp_path):
    """A one-block MultiBlockSystem must reproduce FEMSystem's nonlinear
    analysis EXACTLY (same Newton state machine, same evaluations): identical
    increment/Newton history and displacement field."""
    import jax.numpy as jnp

    from femcy_tpu import FEMesh, FEMSystem, SolverConfig
    from femcy_tpu.io.inp import DirichletBC, InpModel, NeumannBC
    from femcy_tpu.materials import LinearIsotropicPlaneStress

    nx, ny, lx, ly = 6, 2, 3.0, 1.0
    xs = np.linspace(0.0, lx, nx + 1)
    ys = np.linspace(0.0, ly, ny + 1)
    nodes = np.array([[x, y] for x in xs for y in ys])

    def nid(i, j):
        return i * (ny + 1) + j

    quads = np.asarray(
        [
            [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)]
            for i in range(nx)
            for j in range(ny)
        ],
        np.int32,
    )
    mat = LinearIsotropicPlaneStress(1000.0, 0.3)
    mesh = FEMesh(nodes, quads, get_element("CPS4"))
    left = np.nonzero(nodes[:, 0] < 1e-12)[0]
    right = np.nonzero(nodes[:, 0] > lx - 1e-12)[0]
    rset = set(right.tolist())
    tip_faces = [f for f in mesh.boundary if all(n in rset for n in f)]
    inp = InpModel(
        nodes=nodes, elements=quads, element_type="CPS4",
        node_sets={}, ele_sets={}, face_sets={},
        dirichlet_bcs=[DirichletBC(left, d, 0.0) for d in range(2)],
        neumann_bcs=[NeumannBC(
            face_set=tip_faces, traction=4.0,
            direction=np.array([0.0, 1.0]),
        )],
        material_type="Elastic", material_params=[1000.0, 0.3],
        geometric_nonlinear=True,
        time_incs=dict(ini_inc=0.5, max_time=1.0, min_inc=1e-4, max_inc=0.5),
    )

    ref = FEMSystem(mesh, mat, geometric_nonlinear=True,
                    config=SolverConfig())
    ref_report = ref.solve(inp)
    assert ref_report.success

    mb = MultiBlockSystem(
        nodes, [ElementBlock(quads, get_element("CPS4"), mat)]
    )
    mb_report = mb.solve_nonlinear(inp)
    assert mb_report.success
    assert mb_report.n_increments == ref_report.n_increments
    assert [r.newton_iters for r in mb_report.increments] == [
        r.newton_iters for r in ref_report.increments
    ]
    np.testing.assert_allclose(
        np.asarray(mb.dof), np.asarray(ref.dof), rtol=1e-9, atol=1e-14
    )
    # large-deformation stress recovery matches too
    _, ref_stress, ref_mises = ref.compute_strain_stress()
    _, mb_stress, mb_mises = mb.block_stress(0)
    np.testing.assert_allclose(
        np.asarray(mb_stress), np.asarray(ref_stress), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        mb.elastic_energy(), ref.elastic_energy(), rtol=1e-9
    )


def test_nonlinear_mixed_type_two_material(tmp_path):
    """Geometric-nonlinear analysis of the CPS4+CPS3 two-material series bar:
    converges, and at a small load the answer approaches the linear series-
    spring solution while keeping interface compatibility."""
    inp_path = tmp_path / "mixed_nl.inp"
    _write_mixed_neumann_inp(inp_path, nlgeom_no=False)
    model = read_inp_multi(str(inp_path))
    assert model.geometric_nonlinear

    # scale the traction down so the geometrically-nonlinear answer is
    # within ~0.2% of the linear one
    model.neumann_bcs[0] = __import__("dataclasses").replace(
        model.neumann_bcs[0], traction=0.5
    )
    system = system_from_model(model)
    dof = np.asarray(system.solve_model(model))
    report = system.last_report
    assert report.success
    assert all(r.converged for r in report.increments)
    assert report.increments[-1].residual < 1e-2

    nodes, _, _, _ = _mixed_rect(4, 2)
    interface = np.nonzero(np.abs(nodes[:, 0] - 1.0) < 1e-12)[0]
    right = np.nonzero(nodes[:, 0] > 2.0 - 1e-12)[0]
    np.testing.assert_allclose(
        dof[interface * 2], 0.5 / 100.0, rtol=2e-3
    )
    np.testing.assert_allclose(
        dof[right * 2], 0.5 / 100.0 + 0.5 / 300.0, rtol=2e-3
    )
    # both blocks carry the same axial Cauchy stress (equilibrium across
    # the material interface)
    s0 = np.asarray(system.block_stress(0)[1])[:, :, 0, 0]
    s1 = np.asarray(system.block_stress(1)[1])[:, :, 0, 0]
    np.testing.assert_allclose(s0.mean(), s1.mean(), rtol=5e-3)
    # Cauchy stress vs the nominal traction differs by the area change (~1%)
    np.testing.assert_allclose(s0.mean(), 0.5, rtol=2e-2)


def test_nonlinear_neo_hookean_steel_sandwich():
    """3D two-material nonlinear bar: left half compressible neo-Hookean
    rubber, right half stiff linear-elastic steel, 10% end stretch with
    nlgeom.  The rubber absorbs nearly the whole stretch and the axial
    Cauchy stress is continuous across the material interface."""
    from types import SimpleNamespace

    from femcy_tpu.materials import LinearIsotropic, NeoHookean

    nx, ny, nz, lx = 4, 2, 2, 2.0
    xs = np.linspace(0.0, lx, nx + 1)
    ys = np.linspace(0.0, 1.0, ny + 1)
    zs = np.linspace(0.0, 1.0, nz + 1)
    nodes = np.array([[x, y, z] for x in xs for y in ys for z in zs])

    def nid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    left_hexes, right_hexes = [], []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                # Abaqus C3D8 node order: bottom face CCW, then top face
                conn = [
                    nid(i, j, k), nid(i + 1, j, k),
                    nid(i + 1, j + 1, k), nid(i, j + 1, k),
                    nid(i, j, k + 1), nid(i + 1, j, k + 1),
                    nid(i + 1, j + 1, k + 1), nid(i, j + 1, k + 1),
                ]
                (left_hexes if i < nx // 2 else right_hexes).append(conn)
    rubber = NeoHookean(C1=0.4, D1=0.5)     # mu=0.8, K=1.0 -> E ~ 1.9
    steel = LinearIsotropic(1000.0, 0.3)
    system = MultiBlockSystem(
        nodes,
        [
            ElementBlock(
                np.asarray(left_hexes, np.int32),
                get_element("C3D8"), rubber, "rubber",
            ),
            ElementBlock(
                np.asarray(right_hexes, np.int32),
                get_element("C3D8"), steel, "steel",
            ),
        ],
    )
    left_n = np.nonzero(nodes[:, 0] < 1e-12)[0]
    right_n = np.nonzero(nodes[:, 0] > lx - 1e-12)[0]
    from femcy_tpu.io.inp import DirichletBC

    def run(stretch):
        model = SimpleNamespace(
            dirichlet_bcs=(
                [DirichletBC(left_n, d, 0.0) for d in range(3)]
                + [DirichletBC(right_n, 0, stretch),
                   DirichletBC(right_n, 1, 0.0),
                   DirichletBC(right_n, 2, 0.0)]
            ),
            neumann_bcs=[],
            geometric_nonlinear=True,
            time_incs=dict(
                ini_inc=0.5, max_time=1.0, min_inc=1e-4, max_inc=0.5
            ),
        )
        system._ini_residual = None
        report = system.solve_nonlinear(model)
        assert report.success
        return np.asarray(system.dof)

    interface = np.nonzero(np.abs(nodes[:, 0] - lx / 2) < 1e-12)[0]

    # small stretch: near-uniaxial state -- interface equilibrium pins the
    # mean axial Cauchy stress of both materials to each other
    dof = run(0.02)
    assert dof[interface * 3].min() > 0.95 * 0.02
    s_rubber = np.asarray(system.block_stress(0)[1])[:, :, 0, 0]
    s_steel = np.asarray(system.block_stress(1)[1])[:, :, 0, 0]
    np.testing.assert_allclose(s_rubber.mean(), s_steel.mean(), rtol=5e-2)
    assert s_rubber.mean() > 0  # tension

    # 10% global stretch (~20% in the rubber): finite deformation with the
    # clamped ends driving a genuinely 3D state near the interface
    dof = run(0.2)
    assert dof[interface * 3].min() > 0.95 * 0.2
    s_rubber = np.asarray(system.block_stress(0)[1])[:, :, 0, 0]
    assert s_rubber.mean() > 0
    e = system.elastic_energy()
    assert np.isfinite(e) and e > 0


def test_solve_model_with_neumann(tmp_path):
    """read_inp_multi parses *Surface/*Dsload (and UPPERCASE *MATERIAL) and
    solve_model applies the traction: a two-material series bar under an
    end load (regression: solve_model crashed with AttributeError because
    InpBlockModel had no neumann_bcs and the reader never parsed them)."""
    nx, ny = 4, 2
    nodes, quads, tris, _ = _mixed_rect(nx, ny)
    nq = len(quads)
    # right-column CPS3 elements whose local (1, 2) edge (= Abaqus face S2)
    # lies on x = lx: the first triangle of each (i = nx-1, j) pair
    right_tris = [((nx - 1 - nx // 2) * ny + j) * 2 for j in range(ny)]
    txt = NEUMANN_INP.format(
        nodes="\n".join(
            f"{i + 1}, {x}, {y}" for i, (x, y) in enumerate(nodes)
        ),
        quads="\n".join(
            f"{i + 1}, " + ", ".join(str(n + 1) for n in e)
            for i, e in enumerate(quads)
        ),
        tris="\n".join(
            f"{nq + i + 1}, " + ", ".join(str(n + 1) for n in e)
            for i, e in enumerate(tris)
        ),
        left=", ".join(
            str(i + 1) for i in np.nonzero(nodes[:, 0] < 1e-12)[0]
        ),
        rightcol=", ".join(str(nq + i + 1) for i in right_tris),
    )
    # this test pins the LINEAR series-bar answer (bare *Step defaults to
    # nlgeom per the reference quirk, and solve_model now honors it)
    txt = txt.replace("*Step", "*Step, nlgeom=NO", 1)
    path = tmp_path / "mixed_neumann.inp"
    path.write_text(txt)

    model = read_inp_multi(str(path))
    assert not model.geometric_nonlinear
    assert model.materials["rubber"][1][0] == 100.0  # UPPERCASE *MATERIAL
    assert len(model.neumann_bcs) == 1
    assert model.neumann_bcs[0].traction == 5.0
    assert len(model.neumann_bcs[0].face_set) == ny

    system = system_from_model(model)
    dof = np.asarray(system.solve_model(model))

    # nu=0 series bar, sigma_xx = t = 5 throughout:
    # u(interface) = t*L1/E1, u(right) = t*(L1/E1 + L2/E2)
    interface = np.nonzero(np.abs(nodes[:, 0] - 1.0) < 1e-12)[0]
    right = np.nonzero(nodes[:, 0] > 2.0 - 1e-12)[0]
    np.testing.assert_allclose(dof[interface * 2], 5.0 / 100.0, rtol=1e-9)
    np.testing.assert_allclose(
        dof[right * 2], 5.0 / 100.0 + 5.0 / 300.0, rtol=1e-9
    )
    for bi in range(2):
        _, stress, _ = system.block_stress(bi)
        sxx = np.asarray(stress)[:, :, 0, 0]
        np.testing.assert_allclose(sxx, 5.0, rtol=1e-9)


# --------------------------------------------------------------------------- #
# Abaqus-CAE section layout: standalone *Elset + *Solid Section (no inline
# elset on the *Element keyword line, no "instance" mention on the sets)
# --------------------------------------------------------------------------- #
def _cae_layout_deck(sections_block):
    """The two-material CPS4+CPS3 bar written the way Abaqus CAE writes it:
    bare *Element blocks, standalone *Elset blocks, *Solid Section mapping."""
    nid = {}
    nodes = []
    k = 1
    for j in range(3):
        for i in range(5):
            nid[(i, j)] = k
            nodes.append(f"{k}, {i * 0.5}, {j * 0.5}")
            k += 1
    quads, tris = [], []
    e = 1
    for j in range(2):
        for i in range(2):
            n1, n2 = nid[(i, j)], nid[(i + 1, j)]
            n3, n4 = nid[(i + 1, j + 1)], nid[(i, j + 1)]
            quads.append(f"{e}, {n1}, {n2}, {n3}, {n4}")
            e += 1
    for j in range(2):
        for i in range(2, 4):
            n1, n2 = nid[(i, j)], nid[(i + 1, j)]
            n3, n4 = nid[(i + 1, j + 1)], nid[(i, j + 1)]
            tris.append(f"{e}, {n1}, {n2}, {n3}")
            e += 1
            tris.append(f"{e}, {n1}, {n3}, {n4}")
            e += 1
    left = ", ".join(str(nid[(0, j)]) for j in range(3))
    right = ", ".join(str(nid[(4, j)]) for j in range(3))
    return (
        "*Heading\nbar\n*Node\n" + "\n".join(nodes)
        + "\n*Element, type=CPS4\n" + "\n".join(quads)
        + "\n*Element, type=CPS3\n" + "\n".join(tris)
        + sections_block
        + f"""*Nset, nset=fix
{left}
*Nset, nset=pull
{right}
*Material, name=hard
*Elastic
300., 0.
*Material, name=soft
*Elastic
100., 0.
*Step, nlgeom=NO
*Static
1., 1., 1e-4, 1.
*Boundary
fix, 1, 2, 0.
pull, 1, 1, 0.4
pull, 2, 2, 0.
*End Step
"""
    )


def test_cae_layout_standalone_elset_sections(tmp_path):
    """Blocks with NO inline elset resolve their material through a
    standalone *Elset fully containing them (and plain *Nset/*Elset lines
    without 'instance' are accepted by the multi-block reader)."""
    path = tmp_path / "cae_plain.inp"
    path.write_text(
        _cae_layout_deck(
            """
*Elset, elset=setq, generate
1, 4, 1
*Elset, elset=sett, generate
5, 12, 1
*Solid Section, elset=setq, material=hard
*Solid Section, elset=sett, material=soft
"""
        )
    )
    model = read_inp_multi(str(path))
    assert [(b[0], b[2].shape[0]) for b in model.element_blocks] == [
        ("CPS4", 4),
        ("CPS3", 8),
    ]
    assert model.material_of_block(0) == ("Elastic", [300.0, 0.0])
    assert model.material_of_block(1) == ("Elastic", [100.0, 0.0])
    system = system_from_model(model)
    dof = np.asarray(system.solve_model(model))
    # series bar (nu=0): strain partitions 3:1:... check interface u
    nodes = np.array(
        [[i * 0.5, j * 0.5] for j in range(3) for i in range(5)]
    )
    # hard [0,1] + soft [1,2] under end displacement 0.4:
    # eps_h*E_h = eps_s*E_s, eps_h + eps_s = 0.4  (unit half-lengths)
    eps_s = 0.4 / (1.0 + 100.0 / 300.0)
    interface = np.nonzero(np.abs(nodes[:, 0] - 1.0) < 1e-12)[0]
    np.testing.assert_allclose(
        dof[interface * 2], 0.4 - eps_s, rtol=1e-9
    )


def test_cae_layout_block_split_by_sections(tmp_path):
    """ONE *Element block addressed by two *Solid Section elsets splits
    into per-section sub-blocks with the right materials."""
    path = tmp_path / "cae_split.inp"
    path.write_text(
        _cae_layout_deck(
            """
*Elset, elset=setq, generate
1, 4, 1
*Elset, elset=sett1
5, 6, 9, 10
*Elset, elset=sett2
7, 8, 11, 12
*Solid Section, elset=setq, material=hard
*Solid Section, elset=sett1, material=hard
*Solid Section, elset=sett2, material=soft
"""
        )
    )
    model = read_inp_multi(str(path))
    assert [(b[0], b[1], b[2].shape[0]) for b in model.element_blocks] == [
        ("CPS4", "", 4),
        ("CPS3", "sett1", 4),
        ("CPS3", "sett2", 4),
    ]
    mats = [model.material_of_block(bi)[1][0] for bi in range(3)]
    assert mats == [300.0, 300.0, 100.0]
    system = system_from_model(model)
    dof = np.asarray(system.solve_model(model))
    # hard on [0,1.5], soft on [1.5,2]: eps_h*3 + eps_s = 0.4 with
    # eps_h*E_h = eps_s*E_s -> eps_s = 0.4/(1.5/0.5 * (100/300) + 1) ... use
    # total compliance: u = sxx*(1.5/300 + 0.5/100); sxx = 0.4/(1.5/300+0.5/100)
    sxx = 0.4 / (1.5 / 300.0 + 0.5 / 100.0)
    nodes = np.array(
        [[i * 0.5, j * 0.5] for j in range(3) for i in range(5)]
    )
    interface = np.nonzero(np.abs(nodes[:, 0] - 1.5) < 1e-12)[0]
    np.testing.assert_allclose(
        dof[interface * 2], sxx * 1.5 / 300.0, rtol=1e-9
    )
    for bi, E in enumerate([300.0, 300.0, 100.0]):
        _, stress, _ = system.block_stress(bi)
        np.testing.assert_allclose(
            np.asarray(stress)[:, :, 0, 0], sxx, rtol=1e-9
        )


def test_cae_layout_overlapping_sections_raise(tmp_path):
    """Two sections claiming the same element is a model error."""
    path = tmp_path / "cae_dup.inp"
    path.write_text(
        _cae_layout_deck(
            """
*Elset, elset=setq, generate
1, 4, 1
*Elset, elset=sett1, generate
5, 10, 1
*Elset, elset=sett2, generate
9, 12, 1
*Solid Section, elset=setq, material=hard
*Solid Section, elset=sett1, material=hard
*Solid Section, elset=sett2, material=soft
"""
        )
    )
    with pytest.raises(ValueError, match="more than one"):
        read_inp_multi(str(path))


def _two_material_box(nx=6):
    """3D: unstructured box split at z=0.5 into two C3D4 blocks with
    different moduli -- the fast-solver routing fixture."""
    from femcy_tpu.meshgen import unstructured_box_tets
    from femcy_tpu.materials import LinearIsotropic

    mesh = unstructured_box_tets(nx)
    centers = mesh.nodes[mesh.elements].mean(axis=1)
    low = centers[:, 2] < 0.5
    m1 = LinearIsotropic(modulus=100.0, poisson_ratio=0.3)
    m2 = LinearIsotropic(modulus=300.0, poisson_ratio=0.3)
    system = MultiBlockSystem(
        mesh.nodes,
        [
            ElementBlock(mesh.elements[low], mesh.element, m1, "soft"),
            ElementBlock(mesh.elements[~low], mesh.element, m2, "stiff"),
        ],
    )
    n_dof = system.n_dof
    fixed = np.zeros(n_dof, bool)
    bot = np.nonzero(mesh.nodes[:, 2] < 1e-9)[0]
    for d in range(3):
        fixed[bot * 3 + d] = True
    rhs = np.zeros(n_dof)
    top = np.nonzero(mesh.nodes[:, 2] > mesh.nodes[:, 2].max() - 1e-9)[0]
    rhs[top * 3] = 1.0
    return mesh, system, rhs, fixed


def _direct_reference(system, rhs, fixed):
    import scipy.sparse.linalg as spla
    import jax.numpy as jnp

    values, b = system._jit_system(
        system._arrs, jnp.asarray(rhs), jnp.asarray(fixed),
        jnp.asarray(np.zeros(system.n_dof)),
    )
    A = system.pattern.to_scipy(np.asarray(values, np.float64))
    return spla.spsolve(A.tocsc(), np.asarray(b, np.float64))


def test_multiblock_amg_solver_matches_direct():
    """Round-4 (VERDICT weakness 6): multi-material models route through
    the fast solvers.  AMG-PCG over the UNION operator matches the direct
    answer on a two-material unstructured 3D model."""
    from femcy_tpu.config import SolverConfig

    # nx=10 -> 3993 dofs: above coarse_max_dof, so a real 2-level hierarchy
    mesh, system, rhs, fixed = _two_material_box(10)
    system.config = SolverConfig(
        preconditioner="amg", linear_solver="cg", cg_eps=1e-8
    )
    x = np.asarray(system.solve(rhs, fixed, np.zeros(system.n_dof)))
    x_ref = _direct_reference(system, rhs, fixed)
    assert np.abs(x - x_ref).max() / np.abs(x_ref).max() < 1e-5
    assert system._amg is not None and system._amg.n_levels >= 2


def test_multiblock_dense_cg_matches_direct():
    """The small-model dense gather-free CG (dense_operator_max_dof) is
    reachable from MultiBlockSystem."""
    from femcy_tpu.config import SolverConfig

    mesh, system, rhs, fixed = _two_material_box(4)
    system.config = SolverConfig(
        linear_solver="cg", dense_operator_max_dof=2000, cg_eps=1e-8
    )
    assert system.n_dof <= 2000
    x = np.asarray(system.solve(rhs, fixed, np.zeros(system.n_dof)))
    assert system._jit_dense_cg is not None  # the dense path actually ran
    x_ref = _direct_reference(system, rhs, fixed)
    assert np.abs(x - x_ref).max() / np.abs(x_ref).max() < 1e-5
