"""C3D20 quadratic serendipity hexahedra -- capability beyond the reference
(which parses C3D20 keeping only the 8 corner nodes it can never solve,
SURVEY.md §2.3 / inp_info.py:85-113)."""

import jax.numpy as jnp
import numpy as np

from femcy_tpu import FEMesh, FEMSystem, SolverConfig, read_inp
from femcy_tpu.elements import HEX20
from femcy_tpu.elements.library import _HEX20_NAT
from femcy_tpu.materials import LinearIsotropic, material_from_inp
from femcy_tpu.meshgen import box_hexes, box_hexes20
from femcy_tpu.solvers.direct import direct_solve


def test_hex20_shape_functions():
    rng = np.random.default_rng(0)
    quad = lambda p: (  # noqa: E731
        p[0] ** 2 + 2 * p[1] ** 2 - p[2] ** 2 + p[0] * p[1] + p[1] * p[2] + 3
    )
    nodal_quad = np.array([quad(p) for p in _HEX20_NAT])
    for _ in range(5):
        x = rng.uniform(-1, 1, 3)
        N = HEX20.shape_fn(x)
        dN = HEX20.dshape_fn(x)
        assert abs(N.sum() - 1) < 1e-13  # partition of unity
        assert np.abs(dN.sum(axis=0)).max() < 1e-13  # rigid-body mode
        assert np.abs(N @ _HEX20_NAT - x).max() < 1e-13  # linear completeness
        # serendipity quadratic completeness
        assert abs(N @ nodal_quad - quad(x)) < 1e-12
    # kronecker property at the nodes
    for i, p in enumerate(_HEX20_NAT):
        e = np.zeros(20)
        e[i] = 1
        np.testing.assert_allclose(HEX20.shape_fn(p), e, atol=1e-13)
    # analytic gradients match central differences
    x0 = np.array([0.2, -0.3, 0.5])
    dN = HEX20.dshape_fn(x0)
    for a in range(3):
        xp, xm = x0.copy(), x0.copy()
        xp[a] += 1e-6
        xm[a] -= 1e-6
        num = (HEX20.shape_fn(xp) - HEX20.shape_fn(xm)) / 2e-6
        np.testing.assert_allclose(num, dN[:, a], atol=1e-8)


def test_hex20_volume_extrapolation_facets():
    from femcy_tpu import assembly

    _, vol = assembly.gradients_and_volume(
        jnp.asarray(_HEX20_NAT),
        jnp.asarray(np.arange(20)[None, :]),
        jnp.asarray(HEX20.dshape_at_gp),
        jnp.asarray(HEX20.gauss_weights),
    )
    np.testing.assert_allclose(float(vol.sum()), 8.0, rtol=1e-12)

    # GP->node extrapolation reproduces quadratic fields exactly
    M = HEX20.extrapolation_matrix
    f = lambda p: p[0] ** 2 - p[1] * p[2] + 2 * p[2] + 1  # noqa: E731
    gp_vals = np.array([f(p) for p in HEX20.gauss_points])
    exact = np.array([f(p) for p in _HEX20_NAT])
    np.testing.assert_allclose(M @ gp_vals, exact, atol=1e-12)

    # all six faces: exact area 4, unit outward normals, PoU shape values
    for key in HEX20.facet_natural_coos:
        normals, aw, sv = HEX20.facet_quadrature(_HEX20_NAT, list(key))
        np.testing.assert_allclose(aw.sum(), 4.0, rtol=1e-12)
        np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-12)
        np.testing.assert_allclose(sv.sum(axis=1), 1.0, atol=1e-12)


def _uniaxial(mesh, mat, strain=0.01):
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


def test_hex20_patch_test_exact():
    """Uniaxial stretch with nu=0: sigma_xx = E*eps exactly, everywhere."""
    mesh = box_hexes20(2, 2, 2)
    sxx = _uniaxial(mesh, LinearIsotropic(100.0, 0.0))
    np.testing.assert_allclose(sxx, 1.0, rtol=1e-9)


def test_hex20_beats_hex8_on_coarse_bending():
    """Quadratic hexes resolve bending on a grid where trilinear ones are
    visibly too stiff (Euler-Bernoulli tip deflection 0.864)."""
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

    d20 = bend(box_hexes20(6, 1, 1, 6.0, 1.0, 1.0))
    d8 = bend(box_hexes(6, 1, 1, 6.0, 1.0, 1.0))
    assert abs(d20 - 0.864) / 0.864 < 0.08
    assert d8 < d20  # trilinear locks on this coarse grid


def test_c3d20_inp_roundtrip(tmp_path):
    """A C3D20 .inp model parses with ALL 20 nodes AND solves (the reference
    keeps 8 corner nodes and then crashes looking up the element class)."""
    mesh = box_hexes20(2, 2, 2)
    lines = ["*Heading", "hex20 cube", "*Node"]
    for i, p in enumerate(mesh.nodes):
        lines.append(f"{i+1}, {p[0]}, {p[1]}, {p[2]}")
    lines.append("*Element, type=C3D20")
    for e, conn in enumerate(mesh.elements):
        ids = [str(int(c) + 1) for c in conn]
        # Abaqus wraps connectivity lines at 16 entries
        lines.append(f"{e+1}, " + ", ".join(ids[:15]) + ",")
        lines.append(", ".join(ids[15:]))
    bottom = np.nonzero(mesh.nodes[:, 2] < 1e-12)[0] + 1
    top_eles = [
        e + 1 for e, conn in enumerate(mesh.elements)
        if (mesh.nodes[conn][:, 2] > 1 - 1e-12).sum() == 8
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
    f = tmp_path / "hex20cube.inp"
    f.write_text("\n".join(lines) + "\n")

    inp = read_inp(str(f))
    assert inp.element_type == "C3D20"
    assert inp.elements.shape[1] == 20
    mat = material_from_inp(inp.material_type, inp.material_params, inp.element_type)
    system = FEMSystem(FEMesh(inp.nodes, inp.elements, inp.element), mat, False)
    report = system.solve(inp)
    assert report.success
    dof = np.asarray(system.dof).reshape(-1, 3)
    top = np.nonzero(inp.nodes[:, 2] > 1 - 1e-12)[0]
    assert dof[top, 2].mean() > 0
    np.testing.assert_allclose(dof[top, 2].mean(), 2.0 / 1000.0, rtol=0.2)
