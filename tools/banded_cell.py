"""Run ONE cell of the banded weak-scaling matrix and merge it into
BANDED_SWEEP.json.

The full sweep (tools/banded_weak_scaling.py) runs 9 cells and takes hours
on this single-core CPU host; the 531k-dof / 8-device cell crashed on an
XLA CPU-collective rendezvous timeout when two bench processes contended
for the one core (see commit d762d8f).  This reruns any single cell clean:

    PYTHONPATH=/root/repo python tools/banded_cell.py <n_long> <n_thick> <D>
    e.g.  python tools/banded_cell.py 400 20 8    # the 530,523-dof x8 cell
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from femcy_tpu.materials import LinearIsotropic  # noqa: E402
from femcy_tpu.meshgen import cantilever_tets  # noqa: E402
from femcy_tpu.parallel.banded import BandedShardedSolver  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "BANDED_SWEEP.json")


def main():
    nl, nt, D = (int(a) for a in sys.argv[1:4])
    devs = jax.devices()
    if len(devs) < D:
        raise SystemExit(
            f"need {D} virtual devices, have {len(devs)}: set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8"
        )
    material = LinearIsotropic(modulus=1000.0, poisson_ratio=0.3)
    mesh, fixed_nodes, loaded = cantilever_tets(nl, nt)
    fixed = np.zeros(mesh.n_dof, dtype=bool)
    for d in range(3):
        fixed[fixed_nodes * 3 + d] = True
    rhs = np.zeros(mesh.n_dof)
    rhs[loaded * 3 + 0] = 1.0
    t0 = time.time()
    solver = BandedShardedSolver(mesh, material, devices=devs[:D], cg_eps=1e-5)
    t_setup = time.time() - t0
    t0 = time.time()
    x, iters = solver.solve(rhs, fixed, np.zeros(mesh.n_dof))
    t_solve = time.time() - t0
    assert np.isfinite(x).all() and np.abs(x).max() > 0
    row = dict(
        n_dof=int(mesh.n_dof), devices=D, B=int(solver.ops.B),
        iters=int(iters), setup_s=round(t_setup, 1),
        solve_s=round(t_solve, 1),
    )
    print(json.dumps(row), flush=True)

    with open(OUT) as f:
        out = json.load(f)
    rows = [
        r for r in out["matrix"]
        if not (r["n_dof"] == row["n_dof"] and r["devices"] == D)
    ]
    rows.append(row)
    rows.sort(key=lambda r: (r["n_dof"], r["devices"]))
    out["matrix"] = rows
    growth = {}
    for dd in sorted({r["devices"] for r in rows}):
        its = [r["iters"] for r in rows if r["devices"] == dd]
        if len(its) >= 2:
            growth[str(dd)] = round(max(its) / max(min(its), 1), 2)
    out["iter_growth_across_sizes_per_device"] = growth
    out["max_growth"] = max(growth.values()) if growth else None
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"merged into {OUT}; max growth {out['max_growth']}x")


if __name__ == "__main__":
    main()
