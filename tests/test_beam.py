"""B31 space-beam element: analytic Timoshenko anchors + .inp round trip.

The reference parses B31 but crashes on use (reader/inp_info.py:98-100 with
no element class at :118-123); these tests cover femcy_tpu's working
implementation (femcy_tpu/beam.py) against closed-form beam theory.
"""

import numpy as np
import pytest

from femcy_tpu.beam import BeamModel, BeamSection, read_beam_inp, solve_beam

E = 210.0e9
NU = 0.3
G = E / (2 * (1 + NU))


def _cantilever(n_el: int, length: float, section: BeamSection) -> BeamModel:
    x = np.linspace(0.0, length, n_el + 1)
    nodes = np.stack([x, np.zeros_like(x), np.zeros_like(x)], axis=1)
    elements = np.stack([np.arange(n_el), np.arange(1, n_el + 1)], axis=1).astype(
        np.int32
    )
    diri = [(0, d, 0.0) for d in range(6)]  # encastre at the root
    return BeamModel(
        nodes=nodes, elements=elements, section=section, E=E, nu=NU, dirichlet=diri
    )


@pytest.mark.parametrize("n_el", [1, 8])
def test_cantilever_tip_load_timoshenko(n_el):
    # tip load along global y == local section axis 2 (n1 default (0,0,-1)
    # puts axis 1 on -z, axis 2 on +y): bending stiffness I11, shear kappa2
    L, a, b, P = 2.0, 0.05, 0.08, 1000.0
    sec = BeamSection.rect(a, b)
    m = _cantilever(n_el, L, sec)
    m.loads = [(n_el, 1, P)]
    res = solve_beam(m)
    tip = res.u[n_el, 1]
    exact = P * L**3 / (3 * E * sec.I11) + P * L / (G * sec.kappa2 * sec.A)
    assert tip == pytest.approx(exact, rel=1e-9)
    # root reaction balances the load; root bending moment = -P*L about -z
    assert res.reactions[0, 1] == pytest.approx(-P, rel=1e-9)
    assert abs(res.reactions[0, 3:]).max() == pytest.approx(P * L, rel=1e-9)


def test_cantilever_axial_and_torsion():
    L, r = 3.0, 0.04
    sec = BeamSection.circ(r)
    m = _cantilever(4, L, sec)
    m.loads = [(4, 0, 5.0e4), (4, 3, 2.0e3)]  # axial force + torque at tip
    res = solve_beam(m)
    assert res.u[4, 0] == pytest.approx(5.0e4 * L / (E * sec.A), rel=1e-9)
    assert res.u[4, 3] == pytest.approx(2.0e3 * L / (G * sec.J), rel=1e-9)
    # local end forces: axial N and torque T at node 2 of the last element
    assert res.end_forces[-1, 6] == pytest.approx(5.0e4, rel=1e-6)
    assert res.end_forces[-1, 9] == pytest.approx(2.0e3, rel=1e-6)


def test_frame_invariance_under_rotation():
    """Rotating geometry, section axis and load together must rotate the
    solution: tip deflection magnitude is frame-independent."""
    L, a, b, P = 2.0, 0.05, 0.08, 1000.0
    sec = BeamSection.rect(a, b)
    m = _cantilever(6, L, sec)
    m.loads = [(6, 1, P)]
    ref_tip = solve_beam(m).u[6, :3]

    # an arbitrary (fixed) rotation
    cx, sx = np.cos(0.3), np.sin(0.3)
    cz, sz = np.cos(-0.7), np.sin(-0.7)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    Q = Rz @ Rx

    m2 = _cantilever(6, L, sec)
    m2.nodes = m2.nodes @ Q.T
    m2.section = BeamSection.rect(a, b, n1=tuple(Q @ np.array([0.0, 0.0, -1.0])))
    load_vec = Q @ np.array([0.0, P, 0.0])
    m2.loads = [(6, d, load_vec[d]) for d in range(3)]
    tip2 = solve_beam(m2).u[6, :3]
    np.testing.assert_allclose(tip2, Q @ ref_tip, rtol=1e-8, atol=1e-12)


def test_read_beam_inp_roundtrip(tmp_path):
    inp = tmp_path / "beam.inp"
    inp.write_text(
        """*Heading
 cantilever B31
*Node
1, 0., 0., 0.
2, 1., 0., 0.
3, 2., 0., 0.
*Element, type=B31
1, 1, 2
2, 2, 3
*Nset, nset=root
1,
*Nset, nset=tip
3,
*Beam Section, elset=all, material=steel, section=RECT
0.05, 0.08
0., 0., -1.
*Material, name=steel
*Elastic
210.e9, 0.3
*Boundary
root, ENCASTRE
*Step
*Static
*Cload
tip, 2, 1000.
*End Step
"""
    )
    m = read_beam_inp(str(inp))
    assert m.elements.shape == (2, 2)
    assert m.section.A == pytest.approx(0.004)
    assert len(m.dirichlet) == 6 and len(m.loads) == 1
    res = solve_beam(m)
    sec = m.section
    Lb, P = 2.0, 1000.0
    exact = P * Lb**3 / (3 * E * sec.I11) + P * Lb / (G * sec.kappa2 * sec.A)
    assert res.u[2, 1] == pytest.approx(exact, rel=1e-9)


def test_cli_routes_b31(tmp_path, capsys):
    inp = tmp_path / "frame.inp"
    inp.write_text(
        """*Node
1, 0., 0., 0.
2, 1., 0., 0.
*Element, type=B31
1, 1, 2
*Beam Section, elset=all, material=m, section=CIRC
0.02
*Material, name=m
*Elastic
200.e9, 0.29
*Boundary
1, ENCASTRE
*Cload
2, 2, -40.
"""
    )
    from femcy_tpu.cli import main as cli_main

    rc = cli_main([str(inp)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "1 B31 elements" in out and "max deflection" in out


def test_boundary_dof_ranges_and_numeric_nodes(tmp_path):
    """first..last dof ranges and bare node ids in *Boundary / *Cload."""
    inp = tmp_path / "beam2.inp"
    inp.write_text(
        """*Node
1, 0., 0., 0.
2, 0., 0., 1.5
*Element, type=B31
1, 1, 2
*Beam General Section, elset=all, material=m
1.0e-3, 2.0e-7, 0., 2.0e-7, 4.0e-7
1., 0., 0.
*Material, name=m
*Elastic
70.e9, 0.33
*Boundary
1, 1, 6
*Cload
2, 3, -250.
"""
    )
    m = read_beam_inp(str(inp))
    assert len(m.dirichlet) == 6
    res = solve_beam(m)
    # axial: beam along z, load along z
    assert res.u[1, 2] == pytest.approx(-250.0 * 1.5 / (70.0e9 * 1.0e-3), rel=1e-9)


def test_element_block_comment_lines_do_not_truncate(tmp_path):
    """Regression (ADVICE r4, low): a '**' comment line INSIDE an *Element
    block (legal Abaqus) used to reset the reading state and silently drop
    every subsequent element of the block."""
    inp = tmp_path / "beam_comment.inp"
    inp.write_text(
        """*Node
1, 0., 0., 0.
2, 1., 0., 0.
3, 2., 0., 0.
*Element, type=B31
1, 1, 2
** a mid-block comment, legal in Abaqus
2, 2, 3
*Beam Section, elset=all, material=steel, section=RECT
0.05, 0.08
*Material, name=steel
*Elastic
210.e9, 0.3
*Boundary
1, ENCASTRE
*Cload
3, 2, 1000.
"""
    )
    m = read_beam_inp(str(inp))
    assert m.elements.shape == (2, 2)


def test_cli_b31_detection_matches_element_headers_only(tmp_path):
    """Regression (ADVICE r4, low): B31 routing must key on *Element header
    lines, not a whole-file substring -- a continuum model mentioning 'b31'
    in a set name must NOT be routed to the beam solver."""
    from femcy_tpu.cli import _element_types

    continuum = """*Node
1, 0., 0.
*Element, type=CPS3
1, 1, 2, 3
*Nset, nset=clamp_b31_side
1,
** note: b31 appears in this comment too
*Elastic
200.e9, 0.3
"""
    assert _element_types(continuum) == {"CPS3"}
    beam = """*Node
1, 0., 0., 0.
*ELEMENT, TYPE = B31, ELSET=frame
1, 1, 2
"""
    assert _element_types(beam) == {"B31"}
