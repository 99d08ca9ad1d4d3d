"""Reader tests against the 47 reference fixtures."""

import glob

import numpy as np
import pytest

from femcy_tpu.io.inp import read_inp

ELLIP_CPS3 = "elliptic_membrane/element_linear/ellip_membrane_linEle_localVeryFine.inp"
ELLIP_CPS6 = "elliptic_membrane/element_quadratic/ellip_membrane_quadritic_trig_neumann.inp"
TWIST_C3D4 = "twist/twist_plate_C3D4.inp"


def test_elliptic_cps3(fixtures_dir):
    inp = read_inp(fixtures_dir / ELLIP_CPS3)
    assert inp.nodes.shape == (241, 2)  # SURVEY.md §4 fixture inventory
    assert inp.elements.shape == (407, 3)
    assert inp.element_type == "CPS3"
    assert inp.geometric_nonlinear is False
    assert inp.material_type == "Elastic"
    assert inp.material_params == [210000.0, 0.3]
    assert inp.time_incs == {
        "ini_inc": 1.0,
        "max_time": 1.0,
        "min_inc": 1e-05,
        "max_inc": 1.0,
    }
    # BCs: Set-2 dof 1 fixed, left-edge dof 0 fixed, pressure -10 on Surf-1
    assert len(inp.dirichlet_bcs) == 2
    assert {b.dof for b in inp.dirichlet_bcs} == {0, 1}
    assert all(b.value == 0.0 and not b.user for b in inp.dirichlet_bcs)
    assert len(inp.neumann_bcs) == 1
    assert inp.neumann_bcs[0].traction == 10.0  # -(-10): pressure sign flip
    assert inp.neumann_bcs[0].direction is None
    assert len(inp.neumann_bcs[0].face_set) == 11  # 11 loaded facets
    # connectivity is 0-based and in range
    assert inp.elements.min() == 0
    assert inp.elements.max() == 240


def test_elliptic_cps6(fixtures_dir):
    inp = read_inp(fixtures_dir / ELLIP_CPS6)
    assert inp.element_type == "CPS6"
    assert inp.nodes.shape[0] == 231
    assert inp.elements.shape == (100, 6)
    # every Neumann facet must be a boundary facet of the mesh
    from femcy_tpu.mesh import FEMesh

    mesh = FEMesh(inp.nodes, inp.elements, inp.element)
    for bc in inp.neumann_bcs:
        for facet in bc.face_set:
            assert tuple(facet) in mesh.boundary


def test_twist_c3d4_user_bc(fixtures_dir):
    inp = read_inp(fixtures_dir / TWIST_C3D4)
    assert inp.element_type == "C3D4"
    assert inp.nodes.shape == (323, 3)
    assert inp.elements.shape == (1116, 4)
    assert inp.geometric_nonlinear is True
    assert any(b.user for b in inp.dirichlet_bcs)


def test_all_fixtures_parse(fixtures_dir):
    """Every supported fixture in the corpus must parse cleanly."""
    files = sorted(glob.glob(str(fixtures_dir / "**/*.inp"), recursive=True))
    assert len(files) >= 40
    parsed = 0
    for f in files:
        inp = read_inp(f)
        assert inp.nodes.shape[0] > 0
        assert inp.elements.min() >= 0
        assert inp.elements.max() < inp.nodes.shape[0]
        # all dirichlet node ids in range
        for b in inp.dirichlet_bcs:
            assert (np.asarray(b.node_set) >= 0).all()
            assert (np.asarray(b.node_set) < inp.nodes.shape[0]).all()
            assert 0 <= b.dof < inp.dm
        parsed += 1
    assert parsed == len(files)


def test_neo_hookean_material_parse(fixtures_dir):
    f = fixtures_dir / "cook_membrane/3D/neo-Hookean/cook_3d_linearEl_largeDef.inp"
    inp = read_inp(f)
    assert "neo hooke" in inp.material_type.lower()
    assert inp.material_params == [0.4, 0.05]
