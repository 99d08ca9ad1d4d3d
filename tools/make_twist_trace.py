"""Generate the committed evidence artifacts for the flagship 180-degree
C3D10 twist-with-dynamic-rescue analysis (the reference-published schedule,
/root/reference/README.md:110-120, that neither static machine can finish).

Produces, under tests/artifacts/:

* ``twist_c3d10_180_trace.json`` -- the complete increment log (time, dt,
  Newton/Newmark iterations, residual, converged, elastic energy, max |u|)
  plus the final-state observables, so a reviewer can inspect the marquee
  claim without re-running the ~8-minute analysis;
* ``twist_c3d10_pre_snap.npz`` -- the last converged static checkpoint
  before the ~174.5-degree snap (t <= 0.952), from which the quick-tier
  test resumes ACROSS the snap in under a minute
  (tests/test_e2e_nonlinear.py::test_twist_c3d10_180deg_rescue_from_checkpoint);
* ``twist_c3d10_resume.npz`` -- the rolling checkpoint (every increment),
  used to resume THIS script if interrupted (pass ``--resume``).

Run:  PYTHONPATH=/root/repo python tools/make_twist_trace.py [--resume]
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from femcy_tpu import FEMesh, FEMSystem, SolverConfig, read_inp  # noqa: E402
from femcy_tpu.materials import material_from_inp  # noqa: E402

ART = os.path.join(os.path.dirname(__file__), "..", "tests", "artifacts")
FIXTURE = "/root/reference/tests/twist/twist_plate_C3D10.inp"
PRE_SNAP_T = 0.952  # last static increment before the measured snap window


def main():
    resume = "--resume" in sys.argv
    os.makedirs(ART, exist_ok=True)
    trace_path = os.path.join(ART, "twist_c3d10_180_trace.json")
    pre_snap_path = os.path.join(ART, "twist_c3d10_pre_snap.npz")
    resume_path = os.path.join(ART, "twist_c3d10_resume.npz")
    partial_path = trace_path + ".partial"

    inp = read_inp(FIXTURE)
    # the bench schedule (4.5-degree steps, consistent tangent, no boost):
    # same converged states as the reference-parity schedule at ~1/15 the
    # evaluations (tests/test_e2e_nonlinear.py)
    inp.time_incs = dict(inp.time_incs, max_inc=0.05, ini_inc=0.025)
    cfg = SolverConfig(
        tangent="consistent",
        newton_boost_max=0,
        dynamic_rescue=True,
        checkpoint_path=resume_path,
    )
    mat = material_from_inp(
        inp.material_type, inp.material_params, inp.element_type
    )
    system = FEMSystem(
        FEMesh(inp.nodes, inp.elements, inp.element),
        mat,
        inp.geometric_nonlinear,
        cfg,
    )

    records = []
    if resume and os.path.exists(resume_path):
        system.load_checkpoint(resume_path)
        if os.path.exists(partial_path):
            with open(partial_path) as f:
                records = [json.loads(ln) for ln in f if ln.strip()]
        print(f"resuming from t={system.time0:.4f} with "
              f"{len(records)} recorded increments")

    fh = open(partial_path, "a")

    def on_increment(sy, rec):
        row = dict(
            kinc=rec.kinc,
            time=rec.time,
            dt=rec.dt,
            newton_iters=rec.newton_iters,
            residual=rec.residual,
            converged=rec.converged,
            energy=float(sy.elastic_energy()),
            max_u=float(np.abs(np.asarray(sy.dof)).max()),
        )
        records.append(row)
        fh.write(json.dumps(row) + "\n")
        fh.flush()
        if rec.converged and rec.time <= PRE_SNAP_T:
            sy._write_checkpoint(pre_snap_path, rec.kinc)
        print(f"  inc {rec.kinc}: t={rec.time:.4f} dt={rec.dt:.4f} "
              f"iters={rec.newton_iters} conv={rec.converged} "
              f"E={row['energy']:.4e}")

    t0 = time.time()
    report = system.solve(inp, on_increment=on_increment, resume=resume)
    wall = time.time() - t0
    print(f"solve: success={report.success} t_end={system.time0} "
          f"wall={wall:.1f}s msg={report.message}")
    if not report.success:
        sys.exit(2)

    _, _, mises = system.compute_strain_stress()
    rset = np.unique(
        np.concatenate([b.node_set for b in inp.dirichlet_bcs if b.user])
    )
    r_xy = np.linalg.norm(
        inp.nodes[rset][:, :2] - np.array([40.0, 5.0]), axis=1
    )
    dof = np.asarray(system.dof).reshape(-1, 3)
    u_rot = float(np.linalg.norm(dof[rset][:, :2], axis=1).max())
    rescue = [r for r in records if r["converged"] and r["newton_iters"] > 24]
    out = dict(
        fixture=FIXTURE,
        schedule=dict(inp.time_incs),
        config=dict(
            tangent=cfg.tangent,
            newton_boost_max=cfg.newton_boost_max,
            dynamic_rescue=cfg.dynamic_rescue,
        ),
        backend="cpu/f64",
        wall_time_s=round(wall, 1),
        success=True,
        t_end=float(system.time0),
        n_increments=len(records),
        rescues=[dict(time=r["time"], newmark_steps=r["newton_iters"])
                 for r in rescue],
        final=dict(
            max_mises=float(np.asarray(mises).max()),
            max_u=float(np.abs(dof).max()),
            u_rot=u_rot,
            u_rot_expected_2r=float(2.0 * r_xy.max()),
            elastic_energy=float(system.elastic_energy()),
        ),
        increments=records,
    )
    with open(trace_path, "w") as f:
        json.dump(out, f, indent=1)
    fh.close()
    os.remove(partial_path)
    print(f"wrote {trace_path} and {pre_snap_path}")


if __name__ == "__main__":
    main()
