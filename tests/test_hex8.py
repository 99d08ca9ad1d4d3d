"""C3D8 hexahedra -- capability beyond the reference (which parses C3D8 but
has no element class for it, SURVEY.md §2.3)."""

import jax.numpy as jnp
import numpy as np

from femcy_tpu import FEMesh, FEMSystem, SolverConfig, read_inp
from femcy_tpu import assembly
from femcy_tpu.elements import HEX8
from femcy_tpu.materials import LinearIsotropic, material_from_inp
from femcy_tpu.meshgen import box_hexes, box_tets
from femcy_tpu.solvers.direct import direct_solve


def _uniaxial(mesh, mat, strain=0.01):
    """Prescribed uniaxial stretch with roller supports; returns sigma_xx."""
    fixed = np.zeros(mesh.n_dof, bool)
    sval = np.zeros(mesh.n_dof)
    left = np.nonzero(mesh.nodes[:, 0] < 1e-12)[0]
    right = np.nonzero(mesh.nodes[:, 0] > mesh.nodes[:, 0].max() - 1e-12)[0]
    fixed[left * 3] = True
    fixed[np.nonzero(mesh.nodes[:, 1] < 1e-12)[0] * 3 + 1] = True
    fixed[np.nonzero(mesh.nodes[:, 2] < 1e-12)[0] * 3 + 2] = True
    fixed[right * 3] = True
    sval[right * 3] = strain * mesh.nodes[:, 0].max()

    system = FEMSystem(mesh, mat, False, SolverConfig(linear_solver="direct"))
    values, rhs_bc, _ = system._jit_linear_system(
        system._arrs, jnp.zeros(mesh.n_dof), jnp.asarray(fixed), jnp.asarray(sval)
    )
    pat = system.dia if system.dia is not None else system.pattern
    system.dof = jnp.asarray(direct_solve(pat, values, rhs_bc))
    _, stress, _ = system.compute_strain_stress()
    return np.asarray(stress)[:, :, 0, 0]


def test_hex8_patch_test_exact():
    """Uniaxial stretch with nu=0: sigma_xx = E*eps exactly, everywhere."""
    mesh = box_hexes(3, 2, 2)
    sxx = _uniaxial(mesh, LinearIsotropic(100.0, 0.0))
    np.testing.assert_allclose(sxx, 1.0, rtol=1e-9)


def test_hex8_matches_tets_on_bending():
    """A hex cantilever and a (finer) tet cantilever agree on tip deflection."""
    E, nu = 1000.0, 0.3

    def bend(mesh):
        fixed = np.zeros(mesh.n_dof, bool)
        left = np.nonzero(mesh.nodes[:, 0] < 1e-12)[0]
        for d in range(3):
            fixed[left * 3 + d] = True
        right = np.nonzero(mesh.nodes[:, 0] > mesh.nodes[:, 0].max() - 1e-12)[0]
        rhs = np.zeros(mesh.n_dof)
        rhs[right * 3 + 1] = 1.0 / len(right)
        system = FEMSystem(mesh, LinearIsotropic(E, nu), False,
                           SolverConfig(linear_solver="direct"))
        values, rhs_bc, _ = system._jit_linear_system(
            system._arrs, jnp.asarray(rhs), jnp.asarray(fixed),
            jnp.asarray(np.zeros(mesh.n_dof)),
        )
        pat = system.dia if system.dia is not None else system.pattern
        x = np.asarray(direct_solve(pat, values, rhs_bc))
        return np.abs(x).max()

    d_hex = bend(box_hexes(24, 4, 4, 6.0, 1.0, 1.0))
    d_tet = bend(box_tets(24, 4, 4, 6.0, 1.0, 1.0))
    # Euler-Bernoulli tip deflection: P L^3 / (3 E I) = 216/250 = 0.864
    assert abs(d_hex - 0.864) / 0.864 < 0.1
    # linear tets lock in bending: at the same grid they must be stiffer
    # (smaller deflection) yet in the same regime
    assert 0.6 * d_hex < d_tet < d_hex


def test_c3d8_inp_roundtrip(tmp_path):
    """A C3D8 .inp model parses AND solves (the reference crashes here)."""
    mesh = box_hexes(2, 2, 2)
    lines = ["*Heading", "hex cube", "*Node"]
    for i, p in enumerate(mesh.nodes):
        lines.append(f"{i+1}, {p[0]}, {p[1]}, {p[2]}")
    lines.append("*Element, type=C3D8")
    for e, conn in enumerate(mesh.elements):
        lines.append(f"{e+1}, " + ", ".join(str(int(c) + 1) for c in conn))
    bottom = np.nonzero(mesh.nodes[:, 2] < 1e-12)[0] + 1
    top_eles = [
        e + 1 for e, conn in enumerate(mesh.elements)
        if np.all(mesh.nodes[conn][:, 2].max() > 1 - 1e-12)
        and (mesh.nodes[conn][:, 2] > 1 - 1e-12).sum() >= 4
    ]
    lines += [
        "*Nset, nset=bot, instance=a",
        ", ".join(str(i) for i in bottom),
        "*Elset, elset=_t, internal, instance=a",
        ", ".join(str(e) for e in top_eles),
        "*Surface, type=ELEMENT, name=topload",
        "_t, S2",
        "*Material, name=m",
        "*Elastic",
        "1000., 0.3",
        "*Step, name=s, nlgeom=NO",
        "*Static",
        "1., 1., 1e-05, 1.",
        "*Boundary",
        "bot, 1, 1",
        "*Boundary",
        "bot, 2, 2",
        "*Boundary",
        "bot, 3, 3",
        "*Dsload",
        "topload, P, -2.",
        "*End Step",
    ]
    f = tmp_path / "hexcube.inp"
    f.write_text("\n".join(lines) + "\n")

    inp = read_inp(str(f))
    assert inp.element_type == "C3D8"
    mat = material_from_inp(inp.material_type, inp.material_params, inp.element_type)
    system = FEMSystem(FEMesh(inp.nodes, inp.elements, inp.element), mat, False)
    report = system.solve(inp)
    assert report.success
    dof = np.asarray(system.dof).reshape(-1, 3)
    # outward pressure of -2 => tension pulling the top up: uz > 0 at the top
    top = np.nonzero(inp.nodes[:, 2] > 1 - 1e-12)[0]
    assert dof[top, 2].mean() > 0
    # roughly uniform uniaxial state: uz_top ~ sigma/E * h = 2/1000
    np.testing.assert_allclose(dof[top, 2].mean(), 2.0 / 1000.0, rtol=0.2)


def test_hex8_distorted_face_area_exact():
    """Facet quadrature must integrate planar non-parallelogram faces exactly
    (regression: the corner-triangle measure under-integrated by 33%)."""
    nodes = np.array(
        [
            [0, 0, 0], [1, 0, 0], [2, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [2, 1, 1], [0, 1, 1],
        ],
        dtype=float,
    )
    normals, aw, _ = HEX8.facet_quadrature(nodes, [4, 7, 6, 5])  # top face S2
    np.testing.assert_allclose(aw.sum(), 1.5, rtol=1e-12)  # true area
    np.testing.assert_allclose(normals, [[0.0, 0.0, 1.0]] * 4, atol=1e-12)


def test_hex8_vtk_export(tmp_path):
    from femcy_tpu.io.export import export_vtk

    mesh = box_hexes(2, 2, 2)
    path = export_vtk(mesh, str(tmp_path / "h.vtk"), dof=np.zeros(mesh.n_dof))
    text = open(path).read()
    assert "CELL_TYPES 8" in text
    assert "\n12\n" in text  # VTK_HEXAHEDRON
