"""C3D6 wedges -- capability beyond the reference (which parses C3D6 but
has no element class for it, SURVEY.md §2.3)."""

import jax.numpy as jnp
import numpy as np

from femcy_tpu import FEMesh, FEMSystem, SolverConfig, read_inp
from femcy_tpu.elements import WEDGE6
from femcy_tpu.elements.library import _WEDGE6_NODE_NAT
from femcy_tpu.materials import LinearIsotropic, material_from_inp
from femcy_tpu.meshgen import box_hexes, box_wedges
from femcy_tpu.solvers.direct import direct_solve


def test_wedge6_shape_functions():
    rng = np.random.default_rng(0)
    for _ in range(5):
        g, h = rng.uniform(0, 0.5, 2)
        r = rng.uniform(-1, 1)
        N = WEDGE6.shape_fn([g, h, r])
        dN = WEDGE6.dshape_fn([g, h, r])
        assert abs(N.sum() - 1) < 1e-14  # partition of unity
        assert np.abs(dN.sum(axis=0)).max() < 1e-14  # rigid-body mode
        # linear completeness: N interpolates the natural coordinates
        assert np.abs(N @ _WEDGE6_NODE_NAT - [g, h, r]).max() < 1e-14
    # dshape_fn consistent with shape_fn (central differences)
    x0 = np.array([0.2, 0.3, 0.1])
    dN = WEDGE6.dshape_fn(x0)
    for a in range(3):
        xp, xm = x0.copy(), x0.copy()
        xp[a] += 1e-6
        xm[a] -= 1e-6
        num = (WEDGE6.shape_fn(xp) - WEDGE6.shape_fn(xm)) / 2e-6
        np.testing.assert_allclose(num, dN[:, a], atol=1e-8)


def test_wedge6_reference_volume_and_extrapolation():
    from femcy_tpu import assembly

    nodes = _WEDGE6_NODE_NAT.copy()
    _, vol = assembly.gradients_and_volume(
        jnp.asarray(nodes),
        jnp.asarray(np.arange(6)[None, :]),
        jnp.asarray(WEDGE6.dshape_at_gp),
        jnp.asarray(WEDGE6.gauss_weights),
    )
    np.testing.assert_allclose(float(vol.sum()), 1.0, rtol=1e-12)

    # extrapolation reproduces any linear field exactly
    M = WEDGE6.extrapolation_matrix
    f = lambda p: 2 * p[0] - 3 * p[1] + 0.5 * p[2] + 1  # noqa: E731
    gp_vals = np.array([f(p) for p in WEDGE6.gauss_points])
    exact = np.array([f(p) for p in _WEDGE6_NODE_NAT])
    np.testing.assert_allclose(M @ gp_vals, exact, atol=1e-12)


def test_wedge6_facet_quadrature_exact_areas():
    """Mixed tri/quad facets: exact areas + unit outward normals on the
    reference wedge (incl. the slanted quad face, which needs natural
    TANGENT directions rather than coordinate axes)."""
    nodes = _WEDGE6_NODE_NAT.copy()
    for face, area, nrm in [
        ((0, 1, 2), 0.5, [0, 0, -1]),
        ((3, 4, 5), 0.5, [0, 0, 1]),
        ((0, 1, 4, 3), 2.0, [0, -1, 0]),
        ((1, 2, 5, 4), 2.0 * np.sqrt(2), None),  # slanted
        ((2, 0, 3, 5), 2.0, [-1, 0, 0]),
    ]:
        normals, aw, shape_vals = WEDGE6.facet_quadrature(nodes, list(face))
        np.testing.assert_allclose(aw.sum(), area, rtol=1e-12)
        np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-12)
        if nrm is not None:
            np.testing.assert_allclose(normals, [nrm] * len(aw), atol=1e-12)
        # shape values at facet GPs sum to 1 and vanish off the facet
        np.testing.assert_allclose(shape_vals.sum(axis=1), 1.0, atol=1e-12)
        off = [i for i in range(6) if i not in face]
        np.testing.assert_allclose(shape_vals[:, off], 0.0, atol=1e-12)


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


def test_wedge6_patch_test_exact():
    """Uniaxial stretch with nu=0: sigma_xx = E*eps exactly, everywhere."""
    mesh = box_wedges(3, 2, 2)
    sxx = _uniaxial(mesh, LinearIsotropic(100.0, 0.0))
    np.testing.assert_allclose(sxx, 1.0, rtol=1e-9)


def test_wedge6_matches_hexes_on_bending():
    """Wedge and hex cantilevers at the same grid agree on tip deflection."""
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
    d_wed = bend(box_wedges(24, 4, 4, 6.0, 1.0, 1.0))
    # wedges are stiffer than hexes at the same grid but the same regime
    assert 0.5 * d_hex < d_wed <= d_hex


def test_c3d6_inp_roundtrip(tmp_path):
    """A C3D6 .inp model parses AND solves (the reference crashes here),
    including a *Dsload on the quad side faces of the prisms."""
    mesh = box_wedges(2, 2, 2)
    lines = ["*Heading", "wedge cube", "*Node"]
    for i, p in enumerate(mesh.nodes):
        lines.append(f"{i+1}, {p[0]}, {p[1]}, {p[2]}")
    lines.append("*Element, type=C3D6")
    for e, conn in enumerate(mesh.elements):
        lines.append(f"{e+1}, " + ", ".join(str(int(c) + 1) for c in conn))
    bottom = np.nonzero(mesh.nodes[:, 2] < 1e-12)[0] + 1
    # S2 (top triangle) of every prism in the top layer of cells
    top_eles = [
        e + 1 for e, conn in enumerate(mesh.elements)
        if (mesh.nodes[conn][:, 2] > 1 - 1e-12).sum() == 3
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
    f = tmp_path / "wedgecube.inp"
    f.write_text("\n".join(lines) + "\n")

    inp = read_inp(str(f))
    assert inp.element_type == "C3D6"
    mat = material_from_inp(inp.material_type, inp.material_params, inp.element_type)
    system = FEMSystem(FEMesh(inp.nodes, inp.elements, inp.element), mat, False)
    report = system.solve(inp)
    assert report.success
    dof = np.asarray(system.dof).reshape(-1, 3)
    top = np.nonzero(inp.nodes[:, 2] > 1 - 1e-12)[0]
    # outward pressure of -2 => tension: uz_top ~ sigma/E * h = 2/1000
    assert dof[top, 2].mean() > 0
    np.testing.assert_allclose(dof[top, 2].mean(), 2.0 / 1000.0, rtol=0.2)
