"""Reader behavioural-parity quirks (documented in io/inp.py's docstring)."""

import numpy as np
import pytest

from femcy_tpu.io.inp import read_inp

MINIMAL = """*Heading
test
*Node
1, 0., 0.
2, 1., 0.
3, 0., 1.
4, 1., 1.
*Element, type=CPS3
1, 1, 2, 3
2, 2, 4, 3
*Nset, nset=left, instance=a
1, 3
*Elset, elset=_s, internal, instance=a
1
*Surface, type=ELEMENT, name=load
_s, S1
*Material, name=m
*Elastic
100., 0.3
*Step, name=s{step_tail}
*Static
{static}
*Boundary{bnd_tail}
left, 1, 1{bnd_val}
*Dsload
load, P, -5.
*End Step
"""


def _write(tmp_path, **kw):
    defaults = dict(step_tail=", nlgeom=NO", static="1., 1., 1e-05, 1.",
                    bnd_tail="", bnd_val="")
    defaults.update(kw)
    p = tmp_path / "m.inp"
    p.write_text(MINIMAL.format(**defaults))
    return str(p)


def test_minimal_model(tmp_path):
    inp = read_inp(_write(tmp_path))
    assert inp.nodes.shape == (4, 2)
    assert inp.elements.shape == (2, 3)
    assert not inp.geometric_nonlinear
    assert inp.dirichlet_bcs[0].dof == 0
    assert inp.dirichlet_bcs[0].value == 0.0
    assert inp.neumann_bcs[0].traction == 5.0  # pressure sign flip
    # S1 of element 1 (CPS3 facet (0,1)) -> global nodes (0,1) sorted
    assert inp.neumann_bcs[0].face_set == [(0, 1)]


def test_nlgeom_missing_reads_nonlinear(tmp_path):
    """Parity quirk: *Step without nlgeom= parses as nonlinear
    (ref: inp_info.py:319-330)."""
    inp = read_inp(_write(tmp_path, step_tail=""))
    assert inp.geometric_nonlinear is True


def test_boundary_fourth_column_value(tmp_path):
    inp = read_inp(_write(tmp_path, bnd_val=", 0.25"))
    assert inp.dirichlet_bcs[0].value == 0.25


def test_boundary_user_flag(tmp_path):
    inp = read_inp(_write(tmp_path, bnd_tail=", user"))
    assert inp.dirichlet_bcs[0].user is True


def test_static_ini_clamped_to_max(tmp_path):
    inp = read_inp(_write(tmp_path, static="0.5, 1., 1e-05, 0.2"))
    assert inp.time_incs["ini_inc"] == 0.2  # clamped (ref: inp_info.py:347-349)


def test_unsupported_but_recognized_type(tmp_path):
    """B31 beams parse (recognized keyword) but have no element class --
    same boundary as the reference, but with a clear error instead of a
    KeyError deep in a dict lookup.  (C3D8/C3D6/C3D20 used to be here too;
    femcy-tpu now supports all three, see tests/test_hex8.py /
    test_wedge6.py / test_hex20.py.)"""
    src = tmp_path / "b31.inp"
    src.write_text(
        """*Node
1, 0., 0., 0.
2, 1., 0., 0.
*Element, type=B31
1, 1, 2
*Material, name=m
*Elastic
100., 0.3
"""
    )
    with pytest.raises(KeyError, match="B31"):
        read_inp(str(src))
