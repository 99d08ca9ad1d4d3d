"""Assembly tests: element stiffness properties + scatter vs a dense oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from femcy_tpu import assembly
from femcy_tpu.elements import QUAD4, TET4, TRI3, TRI6
from femcy_tpu.materials import LinearIsotropic, LinearIsotropicPlaneStress
from femcy_tpu.mesh import FEMesh
from femcy_tpu.topology import build_pattern


def _unit_square_tri_mesh(nx=3, ny=3):
    """structured triangle mesh of [0,1]^2"""
    xs = np.linspace(0, 1, nx + 1)
    ys = np.linspace(0, 1, ny + 1)
    nodes = np.array([[x, y] for y in ys for x in xs])
    tris = []
    for j in range(ny):
        for i in range(nx):
            a = j * (nx + 1) + i
            b = a + 1
            c = a + nx + 1
            d = c + 1
            tris += [[a, b, d], [a, d, c]]
    return nodes, np.array(tris, dtype=np.int32)


def _dense_oracle(mesh, material):
    """Independent dense assembly in plain numpy (no jax, no ELL)."""
    elem = mesh.element
    dm, edof = elem.dm, elem.edof
    K = np.zeros((mesh.n_dof, mesh.n_dof))
    C = material.C
    for e in range(mesh.n_elements):
        conn = mesh.elements[e]
        x = mesh.nodes[conn]
        Ke = np.zeros((edof, edof))
        for g in range(elem.n_gp):
            dN = elem.dshape_at_gp[g]
            dxdn = x.T @ dN
            dsdx = dN @ np.linalg.inv(dxdn)
            vol = np.linalg.det(dxdn) * elem.gauss_weights[g]
            B = np.zeros((elem.n_voigt, edof))
            for a in range(elem.n_nodes):
                if dm == 2:
                    B[0, a * 2] = dsdx[a, 0]
                    B[1, a * 2 + 1] = dsdx[a, 1]
                    B[2, a * 2] = dsdx[a, 1]
                    B[2, a * 2 + 1] = dsdx[a, 0]
                else:
                    B[0, a * 3] = dsdx[a, 0]
                    B[1, a * 3 + 1] = dsdx[a, 1]
                    B[2, a * 3 + 2] = dsdx[a, 2]
                    B[3, a * 3] = dsdx[a, 1]
                    B[3, a * 3 + 1] = dsdx[a, 0]
                    B[4, a * 3] = dsdx[a, 2]
                    B[4, a * 3 + 2] = dsdx[a, 0]
                    B[5, a * 3 + 1] = dsdx[a, 2]
                    B[5, a * 3 + 2] = dsdx[a, 1]
            Ke += B.T @ C @ B * vol
        gdofs = np.repeat(conn, dm) * dm + np.tile(np.arange(dm), elem.n_nodes)
        K[np.ix_(gdofs, gdofs)] += Ke
    return K


@pytest.fixture(scope="module")
def tri_mesh():
    nodes, tris = _unit_square_tri_mesh()
    return FEMesh(nodes, tris, TRI3)


def test_ell_assembly_matches_dense_oracle(tri_mesh):
    material = LinearIsotropicPlaneStress(modulus=100.0, poisson_ratio=0.3)
    pattern = build_pattern(tri_mesh)
    dsdx, vol = assembly.gradients_and_volume(
        jnp.asarray(tri_mesh.nodes),
        jnp.asarray(tri_mesh.elements),
        jnp.asarray(tri_mesh.element.dshape_at_gp),
        jnp.asarray(tri_mesh.element.gauss_weights),
    )
    Ke = assembly.element_stiffness(dsdx, vol, jnp.asarray(material.C))
    values = assembly.scatter_stiffness(
        Ke, jnp.asarray(pattern.ensure_scatter_targets()), pattern.n_dof, pattern.width
    )
    K_dense = pattern.to_dense(np.asarray(values))
    K_oracle = _dense_oracle(tri_mesh, material)
    np.testing.assert_allclose(K_dense, K_oracle, atol=1e-10)
    # symmetry
    np.testing.assert_allclose(K_dense, K_dense.T, atol=1e-10)


def test_total_volume(tri_mesh):
    _, vol = assembly.gradients_and_volume(
        jnp.asarray(tri_mesh.nodes),
        jnp.asarray(tri_mesh.elements),
        jnp.asarray(tri_mesh.element.dshape_at_gp),
        jnp.asarray(tri_mesh.element.gauss_weights),
    )
    np.testing.assert_allclose(float(vol.sum()), 1.0, atol=1e-12)


@pytest.mark.parametrize(
    "elem,coords",
    [
        (TRI3, np.array([[1.2, 0.1], [0.3, 1.4], [-0.1, 0.2]])),
        (
            TET4,
            np.array([[0.1, 0, 1.2], [1, 0.2, 0], [0, 0, 0], [0.1, 1.3, 0.2]]),
        ),
    ],
    ids=["tri3", "tet4"],
)
def test_rigid_body_modes_annihilated(elem, coords):
    """Ke must map translations and linearised rotations to zero force."""
    mat = (
        LinearIsotropicPlaneStress(100.0, 0.3)
        if elem.dm == 2
        else LinearIsotropic(100.0, 0.3)
    )
    dsdx, vol = assembly.gradients_and_volume(
        jnp.asarray(coords),
        jnp.asarray(np.arange(elem.n_nodes, dtype=np.int32)[None, :]),
        jnp.asarray(elem.dshape_at_gp),
        jnp.asarray(elem.gauss_weights),
    )
    Ke = np.asarray(assembly.element_stiffness(dsdx, vol, jnp.asarray(mat.C)))[0]
    dm = elem.dm
    # translations
    for d in range(dm):
        u = np.zeros((elem.n_nodes, dm))
        u[:, d] = 1.0
        np.testing.assert_allclose(Ke @ u.reshape(-1), 0.0, atol=1e-9)
    # linearised rotation(s)
    if dm == 2:
        rots = [np.stack([-coords[:, 1], coords[:, 0]], axis=1)]
    else:
        rots = [
            np.stack([-coords[:, 1], coords[:, 0], np.zeros(elem.n_nodes)], axis=1),
            np.stack([np.zeros(elem.n_nodes), -coords[:, 2], coords[:, 1]], axis=1),
        ]
    for u in rots:
        np.testing.assert_allclose(Ke @ u.reshape(-1), 0.0, atol=1e-8)


def test_deformation_gradient_affine_motion():
    """An affine displacement u = A x must give F = I + A at every GP."""
    nodes, tris = _unit_square_tri_mesh(2, 2)
    mesh = FEMesh(nodes, tris, TRI3)
    A = np.array([[0.1, 0.03], [-0.02, 0.2]])
    u = nodes @ A.T
    dsdX0, _ = assembly.gradients_and_volume(
        jnp.asarray(nodes),
        jnp.asarray(mesh.elements),
        jnp.asarray(TRI3.dshape_at_gp),
        jnp.asarray(TRI3.gauss_weights),
    )
    F = np.asarray(
        assembly.deformation_gradient(
            jnp.asarray(u.reshape(-1)), jnp.asarray(mesh.elements), dsdX0
        )
    )
    expected = np.eye(2) + A
    np.testing.assert_allclose(F, np.broadcast_to(expected, F.shape), atol=1e-12)


def test_internal_force_matches_k_times_u_small_strain():
    """In the small-strain limit with the linear material, f_int(u) ~ K u."""
    nodes, tris = _unit_square_tri_mesh(2, 2)
    mesh = FEMesh(nodes, tris, TRI3)
    mat = LinearIsotropicPlaneStress(100.0, 0.3)
    pattern = build_pattern(mesh)
    rng = np.random.default_rng(3)
    u = 1e-8 * rng.standard_normal(mesh.n_dof)

    K = _dense_oracle(mesh, mat)
    f_expected = K @ u

    dsdX0, vol0 = assembly.gradients_and_volume(
        jnp.asarray(nodes),
        jnp.asarray(mesh.elements),
        jnp.asarray(TRI3.dshape_at_gp),
        jnp.asarray(TRI3.gauss_weights),
    )
    F = assembly.deformation_gradient(jnp.asarray(u), jnp.asarray(mesh.elements), dsdX0)
    sigma = assembly.gp_stress(F, mat, large=True)
    coords = jnp.asarray(nodes) + jnp.asarray(u).reshape(-1, 2)
    dsdx, vol = assembly.gradients_and_volume(
        coords,
        jnp.asarray(mesh.elements),
        jnp.asarray(TRI3.dshape_at_gp),
        jnp.asarray(TRI3.gauss_weights),
    )
    f = np.asarray(
        assembly.internal_force(
            dsdx, sigma, vol, jnp.asarray(pattern.force_targets), pattern.n_dof
        )
    )
    scale = max(np.abs(f_expected).max(), 1e-30)
    np.testing.assert_allclose(f / scale, f_expected / scale, atol=1e-5)
