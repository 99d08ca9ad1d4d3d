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


def test_cli_multiblock_rejects_nonlinear(tmp_path, capsys):
    from femcy_tpu.cli import main as cli_main

    inp = tmp_path / "mixed_nl.inp"
    _write_mixed_neumann_inp(inp, nlgeom_no=False)  # bare *Step => nlgeom
    rc = cli_main([str(inp)])
    assert rc == 2
    assert "linear analyses only" in capsys.readouterr().err


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
    path = tmp_path / "mixed_neumann.inp"
    path.write_text(txt)

    model = read_inp_multi(str(path))
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
