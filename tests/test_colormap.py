"""The seven reference color ramps (colorBar.py:11-101).

Each ramp is pinned against an independent piecewise evaluation of the
reference's case formulas (written here directly from the documented
segment behavior, NOT shared with the interp-based implementation), plus
the out-of-range clamp-and-warn semantics.
"""

import numpy as np
import pytest

from femcy_tpu.io.colormap import femcy_colormap, get_color, ramp, resolve_cmap


def _reference_semantics(x, mod):
    """Direct piecewise transcription of what colorBar.py's cases compute."""
    if mod == 1:
        if x >= 0.5:
            return ((x - 0.5) / 0.5, (1 - x) / 0.5, 0.0)
        return (0.0, x / 0.5, (0.5 - x) / 0.5)
    if mod == 2:
        g = (1 - x) / 0.5 if x >= 0.5 else x / 0.5
        return (x, g, 1 - x)
    if mod == 3:
        if x >= 0.5:
            return (1.0, (1 - x) / 0.5, (1 - x) / 0.5)
        return (x / 0.5, x / 0.5, 1.0)
    if mod == 4:
        if x >= 0.75:
            return (1.0, (1 - x) / 0.25, 0.0)
        if x >= 0.5:
            return ((x - 0.5) / 0.25, 1.0, 0.0)
        if x >= 0.25:
            return (0.0, 1.0, (0.5 - x) / 0.25)
        return (0.0, x / 0.25, 1.0)
    if mod == 5:
        return (x, 0.0, 1 - x)
    if mod == 6:
        if x >= 0.5:
            return ((x - 0.5) / 0.5, 0.0, 0.0)
        return (0.0, 0.0, (0.5 - x) / 0.5)
    if mod == 7:
        g = 1 - x if x >= 0.5 else x
        return (x, g, 1 - x)
    raise AssertionError(mod)


@pytest.mark.parametrize("mod", range(1, 8))
def test_ramp_matches_reference_cases(mod):
    xs = np.linspace(0.0, 1.0, 101)
    got = ramp(xs, mod)
    want = np.array([_reference_semantics(float(x), mod) for x in xs])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_out_of_range_semantics():
    with pytest.warns(UserWarning, match="x > 1"):
        assert get_color(1.01, 4) == (0.5, 0.5, 0.5)
    with pytest.warns(UserWarning, match="x < 0"):
        assert get_color(-0.01, 4) == (0.2, 0.2, 0.2)
    # within the 1e-3 tolerance band: clamped, no warning
    r, g, b = get_color(1.0005, 4)
    assert (r, g, b) == (1.0, 0.0, 0.0)


def test_matplotlib_integration(tmp_path):
    cm = femcy_colormap(4)
    assert cm.name == "femcy4"
    # resolve_cmap: femcy names -> Colormap, others pass through
    assert resolve_cmap("femcy3").name == "femcy3"
    assert resolve_cmap("turbo") == "turbo"
    assert resolve_cmap("femcyX") == "femcyX"  # not a ramp number

    # end-to-end through export_png on a tiny mesh
    from femcy_tpu.io.export import export_png
    from femcy_tpu.meshgen import box_tets

    mesh = box_tets(2, 2, 2)
    dof = np.zeros(mesh.n_dof)
    vals = np.random.default_rng(0).random((mesh.n_elements, 4))
    out = export_png(mesh, dof, vals, str(tmp_path / "m.png"), cmap="femcy4")
    assert (tmp_path / "m.png").exists(), out


def test_ramp_unknown_mod():
    with pytest.raises(ValueError, match="mod"):
        ramp(0.5, 0)
