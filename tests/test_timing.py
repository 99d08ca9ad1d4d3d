"""Timer / observability utils."""

import time

from femcy_tpu.utils.timing import Timer, device_trace


def test_timer_separates_first_call():
    t = Timer()
    with t.section("op"):
        time.sleep(0.01)
    with t.section("op"):
        time.sleep(0.01)
    with t.section("op"):
        time.sleep(0.01)
    s = t.summary()["op"]
    assert s["count"] == 3
    assert s["first"] is not None
    assert s["steady_mean"] is not None
    assert s["steady_min"] <= s["steady_mean"]


def test_device_trace_noop():
    with device_trace(None):
        pass  # must be a no-op without a log dir


def test_timer_used_by_system(fixtures_dir):
    from femcy_tpu import FEMesh, FEMSystem, read_inp
    from femcy_tpu.materials import material_from_inp

    inp = read_inp(
        fixtures_dir
        / "elliptic_membrane/element_linear/ellip_membrane_linEle_localVeryFine.inp"
    )
    mat = material_from_inp(inp.material_type, inp.material_params, inp.element_type)
    system = FEMSystem(FEMesh(inp.nodes, inp.elements, inp.element), mat, False)
    system.solve(inp)
    summary = system.timer.summary()
    assert "assemble+bc" in summary and "linear_solve" in summary
