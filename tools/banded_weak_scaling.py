"""Banded-sharding weak-scaling evidence (VERDICT r4 item 4): the two-level
Schwarz PCG iteration matrix over {2, 4, 8} devices x {55k, 203k, 531k}
dofs, on the 8-virtual-device CPU mesh (the same harness the driver's
multichip dryrun uses; real multi-chip hardware is not available here).

Writes BANDED_SWEEP.json at the repo root; ``__graft_entry__.dryrun_multichip``
echoes the matrix into its output (so the MULTICHIP evidence carries it) and
re-verifies one cell live.

The question this answers: the coarse space is 6 rigid-body modes PER BLOCK
(parallel/banded.py build_coarse_basis), so its dimension grows with the
mesh (nbl blocks per device) -- do iterations stay bounded as the mesh
grows relative to the blocks?  Measured answer (this sweep): yes, the
counts are essentially flat in BOTH directions (size and device count).

Run:  PYTHONPATH=/root/repo python tools/banded_weak_scaling.py [--quick]
(needs XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
 PALLAS_AXON_POOL_IPS= to compile the shard_map programs locally.)
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

# (n_long, n_thick) -> dofs: 151*11*11*3=54,813 / 301*15*15*3=203,175 /
# 401*21*21*3=530,523 -- the verdict's 55k / ~200k / ~500k ladder
SIZES = [(150, 10), (300, 14), (400, 20)]
DEVICES = [2, 4, 8]
OUT = os.path.join(os.path.dirname(__file__), "..", "BANDED_SWEEP.json")


def main():
    if "--quick" in sys.argv:
        sizes = SIZES[:2]
    else:
        sizes = SIZES
    devs = jax.devices()
    if len(devs) < max(DEVICES):
        raise SystemExit(
            f"need {max(DEVICES)} virtual devices, have {len(devs)}: set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8"
        )
    material = LinearIsotropic(modulus=1000.0, poisson_ratio=0.3)
    rows = []
    for (nl, nt) in sizes:
        mesh, fixed_nodes, loaded = cantilever_tets(nl, nt)
        fixed = np.zeros(mesh.n_dof, dtype=bool)
        for d in range(3):
            fixed[fixed_nodes * 3 + d] = True
        rhs = np.zeros(mesh.n_dof)
        rhs[loaded * 3 + 0] = 1.0  # axial tension (the dryrun's load case)
        for D in DEVICES:
            t0 = time.time()
            solver = BandedShardedSolver(
                mesh, material, devices=devs[:D], cg_eps=1e-5
            )
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
            rows.append(row)
            print(json.dumps(row), flush=True)
    # growth check: >1.5x across the size sweep at fixed D would mean the
    # rigid-body coarse space stopped scaling (VERDICT r4 item 4 gate)
    growth = {}
    for D in DEVICES:
        its = [r["iters"] for r in rows if r["devices"] == D]
        if len(its) >= 2:
            growth[str(D)] = round(max(its) / max(min(its), 1), 2)
    out = dict(
        harness="8-virtual-device CPU mesh (xla_force_host_platform_"
                "device_count); cantilever_tets axial tension, "
                "preconditioner='twolevel', cg_eps=1e-5",
        matrix=rows,
        iter_growth_across_sizes_per_device=growth,
        max_growth=max(growth.values()) if growth else None,
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}; max iteration growth across sizes: "
          f"{out['max_growth']}x")


if __name__ == "__main__":
    main()
