"""Element-zoo property tests (SURVEY.md §4: partition of unity, gradient
consistency, quadrature volumes, facet normals, extrapolation)."""

import numpy as np
import pytest

from femcy_tpu.elements import (
    ELEMENT_REGISTRY,
    HEX8,
    QUAD4,
    QUAD8,
    TET4,
    TET10,
    TRI3,
    TRI6,
)

ALL = [TRI3, TRI6, QUAD4, QUAD8, TET4, TET10, HEX8]

#: natural-coordinate probes inside each element's parameter domain
_PROBES = {
    2: [[0.2, 0.3], [0.1, 0.05], [0.3, 0.3]],
    3: [[0.2, 0.3, 0.1], [0.1, 0.05, 0.2], [0.25, 0.25, 0.25]],
}
_PROBES_QUAD = [[-0.5, 0.3], [0.9, -0.9], [0.0, 0.0]]


def _probes(elem):
    if elem.name.startswith("quad"):
        return _PROBES_QUAD
    if elem.name.startswith("hex"):
        return [[-0.5, 0.3, 0.2], [0.9, -0.9, 0.1], [0.0, 0.0, 0.0]]
    return _PROBES[elem.dm]


@pytest.mark.parametrize("elem", ALL, ids=lambda e: e.name)
def test_partition_of_unity(elem):
    for xi in _probes(elem):
        vals = elem.shape_fn(np.asarray(xi))
        assert vals.shape == (elem.n_nodes,)
        np.testing.assert_allclose(vals.sum(), 1.0, atol=1e-12)


@pytest.mark.parametrize("elem", ALL, ids=lambda e: e.name)
def test_gradient_sums_to_zero(elem):
    # sum_a dN_a/dxi = 0 follows from partition of unity
    for xi in _probes(elem):
        grads = elem.dshape_fn(np.asarray(xi))
        assert grads.shape == (elem.n_nodes, elem.dm)
        np.testing.assert_allclose(grads.sum(axis=0), 0.0, atol=1e-12)


@pytest.mark.parametrize("elem", ALL, ids=lambda e: e.name)
def test_dshape_matches_finite_difference(elem):
    h = 1e-7
    for xi in _probes(elem):
        xi = np.asarray(xi, dtype=float)
        grads = elem.dshape_fn(xi)
        for d in range(elem.dm):
            e = np.zeros(elem.dm)
            e[d] = h
            fd = (elem.shape_fn(xi + e) - elem.shape_fn(xi - e)) / (2 * h)
            np.testing.assert_allclose(grads[:, d], fd, atol=1e-6)


@pytest.mark.parametrize("elem", ALL, ids=lambda e: e.name)
def test_quadrature_weights_volume(elem):
    # reference-element volume: unit triangle 1/2, unit quad 4, unit tet 1/6,
    # unit hex 8
    expected = {"tri": 0.5, "qua": 4.0, "tet": 1.0 / 6.0, "hex": 8.0}[elem.name[:3]]
    np.testing.assert_allclose(elem.gauss_weights.sum(), expected, atol=1e-12)


@pytest.mark.parametrize("elem", ALL, ids=lambda e: e.name)
def test_extrapolation_reproduces_constants(elem):
    # a constant GP field must extrapolate to the same constant at every node
    M = elem.extrapolation_matrix
    assert M.shape == (elem.n_nodes, elem.n_gp)
    np.testing.assert_allclose(M @ np.ones(elem.n_gp), 1.0, atol=1e-12)


def test_tri6_extrapolation_inverts_shape_values():
    # the GP values of a quadratic-complete *linear* field must round-trip:
    # nodal = M @ N(gp) @ nodal for any linear nodal field
    elem = TRI6
    corners = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])

    def linear_field(x):
        return 1.0 + 2.0 * x[0] - 0.7 * x[1]

    node_nat = np.array(
        [[1, 0], [0, 1], [0, 0], [0.5, 0.5], [0, 0.5], [0.5, 0]], dtype=float
    )
    nodal = np.array([linear_field(x) for x in node_nat])
    gp_vals = elem.shape_at_gp @ nodal
    recovered = elem.extrapolation_matrix @ gp_vals
    np.testing.assert_allclose(recovered, nodal, atol=1e-12)


@pytest.mark.parametrize("elem", ALL, ids=lambda e: e.name)
def test_facet_normals_unit_and_outward(elem):
    # on the identity-mapped reference element, every facet normal must be a
    # unit vector pointing away from the element centroid
    rng = np.random.default_rng(0)
    if elem.name == "tri3":
        nodes = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
    elif elem.name == "tri6":
        nodes = np.array(
            [[1, 0], [0, 1], [0, 0], [0.5, 0.5], [0, 0.5], [0.5, 0]], dtype=float
        )
    elif elem.name == "quad4":
        nodes = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=float)
    elif elem.name == "quad8":
        nodes = np.array(
            [[-1, -1], [1, -1], [1, 1], [-1, 1], [0, -1], [1, 0], [0, 1], [-1, 0]],
            dtype=float,
        )
    elif elem.name == "tet4":
        # natural ordering: N = [z, x, 1-x-y-z, y]
        nodes = np.array(
            [[0, 0, 1], [1, 0, 0], [0, 0, 0], [0, 1, 0]], dtype=float
        )
    elif elem.name == "tet10":
        corners = np.array([[0, 0, 1], [1, 0, 0], [0, 0, 0], [0, 1, 0]], dtype=float)
        mids = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 1), (2, 3)]
        nodes = np.vstack([corners] + [(corners[a] + corners[b]) / 2 for a, b in mids])
    else:  # hex8
        nodes = np.array(
            [
                [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
            ],
            dtype=float,
        )
    centroid = nodes.mean(axis=0)
    for facet in elem.facet_natural_coos:
        normals, aw, shape_vals = elem.facet_quadrature(nodes, list(facet))
        facet_center = nodes[list(facet)].mean(axis=0)
        for q in range(normals.shape[0]):
            np.testing.assert_allclose(np.linalg.norm(normals[q]), 1.0, atol=1e-9)
            assert normals[q] @ (facet_center - centroid) > 0, (
                f"{elem.name} facet {facet} normal points inward"
            )
        assert (aw > 0).all()
        # shape values at facet GPs must vanish... only for nodes opposite the
        # facet in simplex elements; at minimum they are a partition of unity
        np.testing.assert_allclose(shape_vals.sum(axis=1), 1.0, atol=1e-9)


def test_registry_names():
    assert set(ELEMENT_REGISTRY) == {
        "CPS3",
        "CPE3",
        "CPS4",
        "CPE4",
        "CPS6",
        "CPE6",
        "CPS8",
        "CPE8",
        "C3D4",
        "C3D10",
        "C3D8",  # beyond the reference
        "C3D6",  # beyond the reference
        "C3D20",  # beyond the reference
    }
