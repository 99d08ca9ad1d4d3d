"""Benchmark: assemble + PCG-solve a ~1M-element C3D4 mesh on one chip.

The driver-set target (BASELINE.json): <10 s on a single TPU chip.  The
reference publishes no throughput numbers (SURVEY.md §6), so vs_baseline is
measured against that 10 s target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
(vs_baseline > 1 means faster than the target.)

Environment knobs:
  BENCH_NX        cells per cube edge (default 56 -> 1,053,696 tets;
                  dyadically coarsenable dims enable the multigrid
                  preconditioner, others fall back to Jacobi)
  BENCH_DTYPE     f32 (default, TPU-native) | f64
  BENCH_REPS      timed repetitions (default 3)
  BENCH_PLATFORM  force a JAX platform (e.g. cpu); needed because the
                  container sitecustomize pins the TPU backend regardless of
                  JAX_PLATFORMS
  BENCH_STRUCTURED  1 (default) uses the dense structured assembly on
                  structured meshes; 0 forces the general scatter path
  BENCH_MG        1 (default) preconditions the CG with the geometric
                  V-cycle when the grid supports it; 0 = scalar Jacobi
  BENCH_UNSTRUCT_NX  unstructured-metric cube edge (default 56 -> 1.05M
                  elements); BENCH_UNSTRUCT=0 skips
  BENCH_TWIST_COLD_RUNS  fresh-process TPU twist runs for the cold-wall
                  evidence (default 3)

Every metric is compared against the newest BENCH_r*.json and prints a
WARNING line when a time metric regressed >10% round-over-round.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

if os.environ.get("BENCH_DTYPE", "f32") == "f32":
    os.environ["FEMCY_TPU_X64"] = "0"

# persistent XLA compilation cache (repo-local, shared with the twist
# subprocesses via the environment): the TPU twist analysis compiles in
# ~20-60 s on the shared remote service but its HLO is stable, so every
# run after the first skips the compile.  BENCH_COMPILE_CACHE="" disables.
os.environ.setdefault(
    "FEMCY_TPU_COMPILE_CACHE",
    os.environ.get(
        "BENCH_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    ),
)

import jax

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

import jax.numpy as jnp
import numpy as np

import femcy_tpu  # noqa: F401  (sets x64 config)
from femcy_tpu import assembly
from femcy_tpu import bc as bc_mod
from femcy_tpu.materials import LinearIsotropic
from femcy_tpu.meshgen import box_tets
from femcy_tpu.solvers.cg import pcg_solve
from femcy_tpu.solvers.dia import (
    build_dia_pattern,
    build_structured_dia_pattern,
    dia_dirichlet_linear,
    dia_pcg_solve,
    dia_scatter,
)
from femcy_tpu.kernels.dia_spmv import make_spmv
from femcy_tpu.solvers.multigrid import StructuredMultigrid
from femcy_tpu.structured import build_structured_plan, structured_assemble
from femcy_tpu.topology import build_pattern


def sync(x):
    """Force completion (block_until_ready can return early through the
    remote-execution tunnel); reading one scalar back is authoritative."""
    return float(jnp.asarray(x).reshape(-1)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------- #
# regression guard: compare every metric against the newest BENCH_r*.json
# (two rounds in a row a metric drifted >5% unremarked -- VERDICT r4 item 6)
# --------------------------------------------------------------------------- #
def _load_prev_metrics():
    import glob

    files = sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_r*.json"))
    )
    if not files:
        return {}, None
    try:
        with open(files[-1]) as fh:
            tail = json.load(fh).get("tail", "")
    except Exception:
        return {}, None
    prev = {}
    for line in tail.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
                if "metric" in d and "value" in d:
                    prev[d["metric"]] = float(d["value"])
            except Exception:
                pass
    return prev, os.path.basename(files[-1])


_PREV_METRICS, _PREV_BENCH = _load_prev_metrics()


def emit(metric, value, unit, vs_baseline):
    """Print one metric JSON line, with a vs-last-round delta and a
    grep-able WARNING when a time metric regressed more than 10%."""
    prev = _PREV_METRICS.get(metric)
    if prev:
        delta = (value - prev) / prev
        log(f"{metric}: {value} vs {prev} in {_PREV_BENCH} ({delta:+.1%})")
        if unit == "s" and delta > 0.10:
            log(
                f"WARNING: {metric} regressed {delta:+.1%} vs "
                f"{_PREV_BENCH} ({prev} -> {value})"
            )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": value,
                "unit": unit,
                "vs_baseline": vs_baseline,
            }
        ),
        flush=True,
    )


def _cache_entries():
    d = os.environ.get("FEMCY_TPU_COMPILE_CACHE", "")
    try:
        return len(os.listdir(d)) if d and os.path.isdir(d) else -1
    except OSError:
        return -1


#: the reference's OWN reported cost on this exact fixture is ~5 minutes of
#: Taichi kernel compilation alone before any solve
#: (/root/reference/README.md:21); that is the baseline the driver tracks
#: ("end-to-end solve time on the C3D10 twist case", BASELINE.md).
TWIST_BASELINE_S = 300.0
TWIST_INP = "/root/reference/tests/twist/twist_plate_C3D10.inp"


def bench_twist():
    """End-to-end C3D10 twist plate: read inp -> nonlinear Newton solve with
    the user rotation BC -> stress recovery, in f64.

    Solves the full 1,993-node/1,116-element fixture to a 90-degree twist
    (max_time=0.5): the complete converged analysis both frameworks can do
    -- the shipped 180-degree schedule walks into a configuration where
    load-stepped Newton fails for C3D10 regardless of tangent
    (tests/test_e2e_convergence.py documents it; C3D4 completes 180).

    Two variants run in subprocesses:

    * host CPU (twist_c3d10_90deg_e2e): at 5,979 dofs the analysis is
      latency-bound; the host LU direct solves finish it in ~17 s.  Routing
      tiny latency-bound models to the host while bulk solves stay on the
      TPU is the intended deployment split.
    * TPU (twist_c3d10_90deg_e2e_tpu): the SAME analysis resident on the
      chip -- config.fused_newton (ONE program dispatch per Newton
      iteration: eval + linear solve) in the device-native f32 with
      config.dense_operator_max_dof (the BC'd operator scattered to dense
      in-program; the CG matvec is a gather-free HBM stream).  Measured
      progression on the chip: 217.6 s (f64, ELL-gather CG) -> 189.8 s
      (f32) -> 117-218 s cold / 31.6 s warm-process (f32 + dense CG; the
      cold spread is the shared remote compile service, observed
      117/198/218/273 s across identical runs).  The cold-run budget is
      dominated by the two one-time server-side program compiles;
      dispatches are ~50 calls x 28 ms tunnel latency.  The consistent
      tangent is built as a lax.scan of 30 JVPs (assembly.py) rather
      than an unrolled jacfwd so the fused program's HLO stays small.
      Accuracy gates are IDENTICAL to the host f64
      run (peak Mises within 0.05%% of the f64 anchor; the displacement-
      controlled solution is independent of E, so f32 loses nothing to
      the E ~ 2e11 stress scale).
    """
    if not os.path.exists(TWIST_INP):
        log(f"twist fixture not found at {TWIST_INP}; skipping twist metric")
        return
    if os.environ.get("BENCH_TWIST_INPROC") != "1":
        import subprocess

        def run_variant(platform, fused, label, timeout_s, x64=True,
                        collect=False):
            env = dict(
                os.environ,
                BENCH_TWIST_INPROC="1",
                BENCH_PLATFORM=platform,
                BENCH_TWIST_FUSED="1" if fused else "0",
                BENCH_TWIST_LABEL=label,
                BENCH_TWIST_X64="1" if x64 else "0",
            )
            if platform == "default":
                env.pop("BENCH_PLATFORM")  # let the backend default (TPU)
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, capture_output=True, text=True, timeout=timeout_s,
                )
            except subprocess.TimeoutExpired:
                log(f"twist[{label}] exceeded {timeout_s}s; skipping")
                return None
            sys.stderr.write(out.stderr)
            if out.returncode != 0:
                log(f"twist[{label}] subprocess failed (rc={out.returncode}); skipping")
                return None
            if not out.stdout.strip():
                log(f"twist[{label}] produced no output; skipping")
                return None
            if collect:
                parsed = {}
                for line in out.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        try:
                            d = json.loads(line)
                            parsed[d["metric"]] = float(d["value"])
                        except Exception:
                            pass
                return parsed
            line = out.stdout.strip().splitlines()[-1]  # the JSON line
            try:
                d = json.loads(line)
                emit(d["metric"], d["value"], d["unit"], d["vs_baseline"])
            except Exception:
                print(line)
            return {}

        # Host speed canary: the host twist runs on a SHARED single-core VM
        # whose effective speed varies run to run (measured: the identical
        # r4-snapshot code walked 8.9 -> 16.4 s across days with zero code
        # change).  A fixed pure-numpy workload timed here lets a reader
        # normalize the host metric against today's host speed before
        # reading a vs-last-round delta as a code regression.
        t0 = time.time()
        _a = np.random.default_rng(0).standard_normal((1500, 1500))
        for _ in range(3):
            _a = np.linalg.solve(_a @ _a.T + 1500 * np.eye(1500), _a)
        canary = time.time() - t0
        log(f"host speed canary (3x 1500^3 solve): {canary:.2f}s")

        # host-CPU baseline (the latency-bound deployment split, see below)
        run_variant(
            os.environ.get("BENCH_TWIST_PLATFORM", "cpu"), fused=False,
            label="twist_c3d10_90deg_e2e", timeout_s=1200,
        )
        # the SAME analysis resident on the TPU backend: fused Newton
        # iterations (one program per iteration, config.fused_newton) cut the
        # per-iteration dispatches from ~3-4 to 1, which is what makes a
        # tunnel-latency-bound small model viable on the device at all.
        # The cold wall through the shared remote-compile service is wildly
        # variable (measured 10-470 s on identical fully-cached runs), so
        # the evidence is recorded, not averaged away: N fresh-process runs,
        # each reporting its cold wall plus the persistent-cache entry delta
        # (0 new entries = the variance is pure service queueing), the
        # median-cold as its own metric, and the warm-process steady wall as
        # the headline (VERDICT r4 item 2).
        if os.environ.get("BENCH_TWIST_TPU", "1") == "1":
            label = "twist_c3d10_90deg_e2e_tpu"
            n_runs = int(os.environ.get("BENCH_TWIST_COLD_RUNS", "3"))
            colds, steady = [], None
            for i in range(n_runs):
                c0 = _cache_entries()
                res = run_variant(
                    "default", fused=True, label=label,
                    timeout_s=1500, x64=False, collect=True,
                )
                c1 = _cache_entries()
                if not res:
                    continue
                cold = res.get(f"{label}_cold")
                st = res.get(label)
                log(
                    f"twist tpu run {i}: cold {cold}s, steady {st}s, "
                    f"cache entries {c0} -> {c1} (+{c1 - c0})"
                )
                if cold is not None:
                    colds.append(cold)
                if st is not None:
                    steady = st
            if colds:
                med = sorted(colds)[len(colds) // 2]
                log(f"twist tpu cold walls: {colds} (median {med}s)")
                emit(f"{label}_cold_median", med, "s",
                     round(TWIST_BASELINE_S / med, 3))
            if steady is not None:
                emit(label, steady, "s",
                     round(TWIST_BASELINE_S / steady, 3))
        return
    import jax as _jax

    x64 = os.environ.get("BENCH_TWIST_X64", "1") == "1"
    _jax.config.update("jax_enable_x64", x64)
    from femcy_tpu import FEMesh, FEMSystem, SolverConfig, read_inp

    t0 = time.time()
    inp = read_inp(TWIST_INP)
    # 4.5-degree rotation increments with the exact consistent tangent
    # instead of the fixture's 2.25-degree schedule driven by the secant +
    # boost heuristic: same converged state (gated below against the
    # schedule- and tolerance-converged anchor) at ~1/15 the evaluations.
    # Larger steps (>9 degrees) measurably jump to a spurious buckled
    # branch -- do not raise max_inc further without re-checking the anchor.
    inp.time_incs = dict(
        inp.time_incs, max_time=0.5, max_inc=0.05, ini_inc=0.025
    )
    fused = os.environ.get("BENCH_TWIST_FUSED", "0") == "1"
    label = os.environ.get("BENCH_TWIST_LABEL", "twist_c3d10_90deg_e2e")
    cfg = SolverConfig(
        tangent="consistent",
        newton_boost_max=0,
        # tol 1e-2 (the reference default) leaves a 3.2% equilibrium bias in
        # the peak Mises (8.92e10 vs the converged 8.6455e10 -- measured:
        # the fine 2.25-degree schedule lands on 8.64549e10 at BOTH tol
        # 1e-3 and 1e-4); the benchmark solves to the real equilibrium
        newton_rel_tol=1.0e-3,
        # host variant: Abaqus-style linear extrapolation halves the Newton
        # evaluations on this smooth rotation path (41 -> ~21) AND lands
        # exactly on the fine-schedule anchor; the device loop requires the
        # 'previous' predictor (extrapolation state is host-side)
        predictor="previous" if fused else "extrapolate",
        # device residency (fused runs): the WHOLE analysis -- adaptive
        # stepping + Newton + relaxation + CG -- as ONE XLA program
        # (config.device_loop); a single dispatch instead of ~60, each of
        # which pays 0.3-5 s of shared-tunnel queueing latency
        device_loop=fused,
        linear_solver="cg" if fused else "auto",
        # small-model device residency: dense gather-free CG (fused runs)
        dense_operator_max_dof=8192 if fused else 0,
    )
    from femcy_tpu.materials import material_from_inp

    mat = material_from_inp(
        inp.material_type, inp.material_params, inp.element_type
    )
    mesh = FEMesh(inp.nodes, inp.elements, inp.element)
    system = FEMSystem(mesh, mat, inp.geometric_nonlinear, config=cfg)
    report = system.solve(inp)
    elapsed = time.time() - t0
    if fused and os.environ.get("BENCH_TWIST_STEADY", "1") == "1":
        # The device-resident variant is dispatch-bound, and the shared
        # remote-TPU service's load/claim queue is wildly variable
        # (measured on IDENTICAL fully-cached runs the same day: 10.3 s /
        # 98.6 s / 116.2 s / 470 s -- zero new cache entries on any of
        # them, i.e. pure service latency).  Re-running the SAME analysis
        # on the warm process measures the framework (executables live,
        # dispatch only) instead of the service's queue: that is the
        # steady-state number a deployed latency-bound model sees, and the
        # cold wall is still printed alongside.  BENCH_TWIST_STEADY=0
        # reports the cold wall instead.
        t1 = time.time()
        report = system.solve(inp)
        steady = time.time() - t1
        log(
            f"twist C3D10 e2e [{label}]: cold {elapsed:.1f}s "
            f"(incl. service compile/load queue), steady {steady:.1f}s"
        )
        # machine-readable cold wall for the parent's multi-run evidence
        print(
            json.dumps(
                {"metric": f"{label}_cold", "value": round(elapsed, 1),
                 "unit": "s",
                 "vs_baseline": round(TWIST_BASELINE_S / elapsed, 3)}
            ),
            flush=True,
        )
        elapsed = steady
    _, _, mises = system.compute_strain_stress()
    max_mises = float(jnp.max(mises))
    assert report.success, "twist C3D10 did not converge to 90 degrees"
    assert np.isfinite(max_mises)
    # accuracy gates: prescribed rotation chord exact; peak Mises within 1%
    # of the schedule- AND tolerance-converged anchor (fine 2.25-degree
    # schedule, identical at tol 1e-3 and 1e-4: 8.64549e10)
    rset = np.unique(
        np.concatenate([b.node_set for b in inp.dirichlet_bcs if b.user])
    )
    r_xy = np.linalg.norm(
        inp.nodes[rset][:, :2] - np.array([40.0, 5.0]), axis=1
    )
    u_rot = np.linalg.norm(
        np.asarray(system.dof).reshape(-1, 3)[rset][:, :2], axis=1
    ).max()
    # prescribed-rotation chord, exact to the working dtype's roundoff
    assert abs(u_rot - 2 * np.sin(np.pi / 4) * r_xy.max()) < (
        1e-6 if x64 else 5e-5
    )
    assert abs(max_mises - 8.6455e10) / 8.6455e10 < 0.01, max_mises
    log(
        f"twist C3D10 e2e [{label}]: {elapsed:.1f}s, {report.n_increments} "
        f"increments, max mises {max_mises:.3e}"
    )
    print(
        json.dumps(
            {
                "metric": label,
                "value": round(elapsed, 1),
                "unit": "s",
                "vs_baseline": round(TWIST_BASELINE_S / elapsed, 3),
            }
        )
    )


def bench_unstructured():
    """Large UNSTRUCTURED C3D4 solve on-chip, SETUP INSIDE THE FENCE
    (VERDICT r4 item 1): the mesh class real .inp files are (irregular
    numbering, jittered geometry -- no DIA offsets, no structured fast
    path, no geometric multigrid).  Times the general path at the driver's
    1M-element target: native C++ ELL pattern (element-order export,
    node-block scatter map), batched-einsum assembly + in-program
    block-target expansion + segment-sum scatter, and smoothed-aggregation
    AMG-PCG whose hierarchy is built from the assembled f32 DEVICE operator
    pulled back once (no f64 host twin) on BSR block matrices end-to-end.

    TWO metrics: ``c3d4_<n>k_unstructured_setup`` -- the one-time host
    setup (pattern + bell plan + AMG hierarchy; target < 30 s) -- and
    ``c3d4_<n>k_unstructured_amg`` -- the steady assemble+solve (target
    < 10 s).  First-run XLA compiles are logged, excluded (persistently
    cached).  BENCH_UNSTRUCT=0 skips; BENCH_UNSTRUCT_NX sets the size
    (default 56 -> 1,053,696 elements / 555,579 dofs).
    """
    from femcy_tpu import FEMSystem, SolverConfig
    from femcy_tpu.meshgen import unstructured_box_tets

    nx = int(os.environ.get("BENCH_UNSTRUCT_NX", "56"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.time()
    mesh = unstructured_box_tets(nx)
    log(
        f"unstructured mesh: {mesh.n_elements} C3D4 elements, "
        f"{mesh.n_dof} dofs ({time.time() - t0:.1f}s)"
    )
    material = LinearIsotropic(modulus=1000.0, poisson_ratio=0.3)
    t0 = time.time()
    system = FEMSystem(
        mesh, material, False,
        SolverConfig(preconditioner="amg", linear_solver="cg"),
    )
    t_pattern = time.time() - t0
    log(
        f"ELL pattern build (native, block targets): {t_pattern:.1f}s, "
        f"phases {system._init_seconds}"
    )

    fixed = np.zeros(mesh.n_dof, dtype=bool)
    bottom = np.nonzero(mesh.nodes[:, 2] < 1e-9)[0]
    top = np.nonzero(mesh.nodes[:, 2] > mesh.nodes[:, 2].max() - 1e-9)[0]
    for d in range(3):
        fixed[bottom * 3 + d] = True
    rhs_np = np.zeros(mesh.n_dof)
    rhs_np[top * 3] = 1.0
    rhs = jnp.asarray(rhs_np)
    fixed_d = jnp.asarray(fixed)
    sval_d = jnp.zeros(mesh.n_dof)

    t0 = time.time()
    values, b, _vol = system._jit_linear_system(
        system._arrs, rhs, fixed_d, sval_d
    )
    sync(values)  # block_until_ready returns early through the tunnel
    log(f"device assembly compile+run: {time.time() - t0:.1f}s")

    t0 = time.time()
    system._ensure_amg(fixed_d, values=values)
    t_amg = time.time() - t0
    log(
        f"AMG setup from the device operator: {t_amg:.1f}s, levels "
        f"{[lv.n_dof for lv in system._amg.levels]}, "
        f"complexity {system._amg.complexity:.2f}, phase breakdown "
        f"{ {k: round(v, 1) for k, v in system._amg.setup_seconds.items()} }, "
        f"host phases {system._amg_host_seconds}"
    )
    stall = system._amg_host_seconds.get("unattributed", 0.0)
    if stall > 30.0:
        log(
            f"WARNING: {stall:.0f}s of the AMG setup fence is a remote-"
            "service queue stall (unattributed wall on cached dispatches), "
            "not setup cost"
        )
    setup_total = t_pattern + t_amg
    emit(
        f"c3d4_{mesh.n_elements//1000}k_unstructured_setup",
        round(setup_total, 1), "s", round(30.0 / setup_total, 3),
    )

    def assemble_and_solve():
        values, b, _vol = system._jit_linear_system(
            system._arrs, rhs, fixed_d, sval_d
        )
        return system._solve_linear_system(values, b, fixed_d)

    t0 = time.time()
    x = assemble_and_solve()
    sync(x)
    log(f"assemble+AMG-PCG compile+run: {time.time() - t0:.1f}s")
    assert np.isfinite(np.asarray(x)).all()

    times = []
    for _ in range(reps):
        t0 = time.time()
        x = assemble_and_solve()
        sync(x)
        times.append(time.time() - t0)
    total = min(times)
    # attribute the steady number: assembly alone (same jitted program)
    t0 = time.time()
    va, _, _ = system._jit_linear_system(system._arrs, rhs, fixed_d, sval_d)
    sync(va)
    log(f"  of which assembly: {time.time() - t0:.3f}s")
    log(
        f"unstructured assemble+AMG-PCG: {total:.3f}s "
        f"({mesh.n_elements / total / 1e6:.2f} M-elem/s end-to-end, "
        f"{system._last_cg_iters} PCG iters)"
    )
    emit(
        f"c3d4_{mesh.n_elements//1000}k_unstructured_amg",
        round(total, 4), "s", round(10.0 / total, 3),
    )

    bench_graded_amg()


def bench_graded_amg():
    """GRADED-mesh AMG evidence in the bench tail (VERDICT r4 item 3):
    SA-AMG's weak spot is graded/anisotropic meshes, and every other AMG
    number here comes from a quasi-uniform jittered box.  Runs the AMG-PCG
    path on a 12:1 geometrically graded tet box (meshgen.graded_box_tets)
    at equal dofs against the uniform box and logs the iteration counts,
    default hierarchy and with the fine-level strength filter
    (config.amg_fine_theta=0.12).  Expected: graded-default within 2x of
    uniform; graded-filtered at or below uniform (measured 38/19 -> 17/19
    at 4k dofs on CPU; tests/test_amg.py pins this).  BENCH_GRADED_NX sets
    the size (default 20 -> 48k elements)."""
    from femcy_tpu import FEMSystem, SolverConfig
    from femcy_tpu.meshgen import graded_box_tets, unstructured_box_tets

    nx = int(os.environ.get("BENCH_GRADED_NX", "20"))
    if nx < 2:
        log("graded-mesh AMG: skipped (BENCH_GRADED_NX < 2)")
        return

    def pcg_iters(mesh, **cfg_kw):
        system = FEMSystem(
            mesh, LinearIsotropic(modulus=1000.0, poisson_ratio=0.3), False,
            SolverConfig(
                preconditioner="amg", linear_solver="cg", **cfg_kw
            ),
        )
        fixed = np.zeros(mesh.n_dof, dtype=bool)
        bottom = np.nonzero(mesh.nodes[:, 2] < 1e-9)[0]
        top = np.nonzero(mesh.nodes[:, 2] > mesh.nodes[:, 2].max() - 1e-9)[0]
        for d in range(3):
            fixed[bottom * 3 + d] = True
        rhs_np = np.zeros(mesh.n_dof)
        rhs_np[top * 3] = 1.0
        fixed_d = jnp.asarray(fixed)
        values, b, _vol = system._jit_linear_system(
            system._arrs, jnp.asarray(rhs_np), fixed_d,
            jnp.zeros(mesh.n_dof),
        )
        x = system._solve_linear_system(values, b, fixed_d)
        assert np.isfinite(np.asarray(x)).all()
        return system._last_cg_iters

    it_u = pcg_iters(unstructured_box_tets(nx))
    gm = graded_box_tets(nx, ratio=12.0)
    it_g = pcg_iters(gm)
    it_gf = pcg_iters(gm, amg_fine_theta=0.12)
    log(
        f"graded-mesh AMG (nx={nx}, 12:1 gradation, equal dofs): "
        f"uniform {it_u} iters, graded {it_g} iters "
        f"({it_g / max(it_u, 1):.2f}x), graded+fine_theta=0.12 {it_gf} "
        f"iters ({it_gf / max(it_u, 1):.2f}x)"
    )
    if it_g > 2 * it_u + 2:
        log("WARNING: graded AMG iterations exceed 2x the uniform count")


def tpu_test_tier():
    """Run the on-chip pytest tier (tests marked ``tpu``,
    tests/test_tpu_kernels.py) on the real backend before any metric is
    emitted (VERDICT r4 item 8): Pallas assembly/SpMV, block-ELL, DIA/ELL
    PCG, AMG and the autodiff tangent kernels at real sizes, previously
    covered on-chip only by the nx=8 selfcheck.  Measured 4:47 cold /
    fast once the persistent compile cache is warm.  A failure aborts the
    benchmark -- wrong kernels must not ship timing numbers.
    BENCH_TPU_TESTS=0 skips."""
    import subprocess

    if jax.default_backend() != "tpu":
        log("tpu test tier: backend is not TPU; skipped")
        return
    t0 = time.time()
    env = dict(
        os.environ, FEMCY_TPU_TEST_BACKEND="tpu", FEMCY_TPU_X64="0"
    )
    # Bounded: the shared remote-compile service can stall for tens of
    # minutes; a hung tier must not starve the driver of every metric.
    # A TIMEOUT is service congestion (log + continue), a FAILURE is a
    # wrong kernel (abort -- no timing numbers over bad stiffness values).
    timeout_s = int(os.environ.get("BENCH_TPU_TESTS_TIMEOUT", "2400"))
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-m", "tpu", "-q", "tests/"],
            env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        log(
            f"tpu test tier: WARNING exceeded {timeout_s}s (remote-compile "
            "queue); skipping the tier, selfcheck already passed on-chip"
        )
        return
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
    log(f"tpu test tier: {tail} ({time.time() - t0:.0f}s)")
    if proc.returncode != 0:
        print(proc.stdout[-4000:], file=sys.stderr)
        raise SystemExit("tpu test tier FAILED; not emitting metrics")


def selfcheck():
    """On-chip kernel regression check (runs on the REAL backend, small NX).

    The one genuine TPU miscompile found so far -- an XLA producer fusion
    feeding the Pallas custom call returned wrong values
    (femcy_tpu/structured.py, optimization_barrier note) -- was caught by
    hand; this makes the driver-run bench catch that class automatically:

    * pallas assembly (structured_assemble_coords, kernel path) must match
      the ANALYTIC f64 operator of the uniform grid;
    * the pallas x-resident SpMV must match the XLA shifted-slice SpMV.

    Logs one line per check; raises on disagreement so a Mosaic/XLA
    regression fails the benchmark instead of shipping wrong stiffness
    values behind a healthy-looking timing number.
    """
    if jax.default_backend() != "tpu":
        log("selfcheck: backend is not TPU; pallas checks skipped")
        return
    from femcy_tpu.structured import (
        analytic_structured_dia_values,
        structured_assemble_coords,
    )

    nx = 8
    mesh = box_tets(nx, nx, nx)
    dia = build_structured_dia_pattern(mesh)
    material = LinearIsotropic(modulus=1000.0, poisson_ratio=0.3)
    plan = build_structured_plan(mesh, dia)
    coords = jnp.asarray(mesh.nodes, jnp.float32)
    dN = jnp.asarray(mesh.element.dshape_at_gp, jnp.float32)
    w = jnp.asarray(mesh.element.gauss_weights, jnp.float32)
    C32 = jnp.asarray(material.C, jnp.float32)

    ref = analytic_structured_dia_values(mesh, np.asarray(material.C), dia)
    # check BOTH preps feeding the Pallas accumulate: the generic 9-term
    # (C traced) and the isotropic 3-term (C_host) -- the latter is what
    # the benchmarked metric and FEMSystem actually run in production
    for tag, c_host in (("generic", None), ("isotropic", np.asarray(material.C))):
        vals = np.asarray(
            jax.jit(
                lambda c, ch=c_host: structured_assemble_coords(
                    c, mesh, dN, w, C32, plan, accumulate="pallas", C_host=ch
                )
            )(coords)
        ).astype(np.float64)
        err_asm = np.abs(vals - ref).max() / np.abs(ref).max()
        assert err_asm < 1e-4, (
            f"pallas assembly ({tag} prep) off the analytic operator: "
            f"{err_asm:.3e}"
        )
        log(
            f"selfcheck: pallas assembly ({tag} prep) vs analytic f64 "
            f"operator rel err {err_asm:.2e} OK"
        )

    spmv = make_spmv(mesh.n_dof, dia.offsets, dtype=jnp.float32)
    if spmv is None:
        log("selfcheck: pallas spmv unavailable at this size; skipped")
        return
    prep, apply_fn = spmv
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(mesh.n_dof), jnp.float32)
    v32 = jnp.asarray(ref.astype(np.float32))
    y_pal = np.asarray(jax.jit(lambda v, xx: apply_fn(prep(v), xx))(v32, x))
    from femcy_tpu.solvers.dia import dia_spmv

    y_xla = np.asarray(jax.jit(
        lambda v, xx: dia_spmv(v, dia.offsets, xx)
    )(v32, x))
    err_spmv = np.abs(y_pal - y_xla).max() / (np.abs(y_xla).max() + 1e-30)
    assert err_spmv < 1e-4, f"pallas SpMV off the XLA slices: {err_spmv:.3e}"
    log(f"selfcheck: pallas SpMV vs XLA shifted slices rel err {err_spmv:.2e} OK")


def main():
    nx = int(os.environ.get("BENCH_NX", "56"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    dtype = jnp.float64 if os.environ.get("BENCH_DTYPE", "f32") == "f64" else jnp.float32

    if os.environ.get("BENCH_TWIST_INPROC") == "1":
        bench_twist()  # subprocess mode: the twist metric only
        return
    log(f"devices: {jax.devices()}")
    if os.environ.get("BENCH_SELFCHECK", "1") == "1":
        selfcheck()
    if os.environ.get("BENCH_TPU_TESTS", "1") == "1":
        tpu_test_tier()
    if os.environ.get("BENCH_TWIST", "1") == "1":
        bench_twist()
    if os.environ.get("BENCH_UNSTRUCT", "1") == "1":
        bench_unstructured()
    if os.environ.get("BENCH_BOX", "1") != "1":
        return
    t0 = time.time()
    mesh = box_tets(nx, nx, nx)
    log(
        f"mesh: {mesh.n_elements} C3D4 elements, {mesh.n_nodes} nodes, "
        f"{mesh.n_dof} dofs ({time.time() - t0:.1f}s)"
    )

    t0 = time.time()
    structured = (
        mesh.structure is not None
        and os.environ.get("BENCH_STRUCTURED", "1") == "1"
    )
    if structured:
        # analytic pattern: no ELL build, no scatter maps (~1s, not ~2min)
        pattern = None
        dia = build_structured_dia_pattern(mesh)
        log(
            f"structured DIA pattern: offsets={dia.n_offsets} "
            f"({time.time() - t0:.1f}s host setup)"
        )
    else:
        pattern = build_pattern(mesh)
        dia = build_dia_pattern(mesh, ell=pattern)
        log(
            f"pattern: width={pattern.width}, nnz={pattern.nnz}, "
            f"dia offsets={dia.n_offsets if dia else None} "
            f"({time.time() - t0:.1f}s host setup)"
        )

    material = LinearIsotropic(modulus=1000.0, poisson_ratio=0.3)

    # BCs: clamp z=0 face, unit traction load on z=1 face nodes
    fixed = np.zeros(mesh.n_dof, dtype=bool)
    bottom = np.nonzero(mesh.nodes[:, 2] < 1e-12)[0]
    top = np.nonzero(mesh.nodes[:, 2] > 1 - 1e-12)[0]
    for d in range(3):
        fixed[bottom * 3 + d] = True
    rhs_np = np.zeros(mesh.n_dof)
    rhs_np[top * 3 + 0] = 1.0  # shear the top face
    sval = np.zeros(mesh.n_dof)

    # device arrays
    nodes = jnp.asarray(mesh.nodes, dtype=dtype)
    elements = jnp.asarray(mesh.elements)
    dN = jnp.asarray(mesh.element.dshape_at_gp, dtype=dtype)
    w = jnp.asarray(mesh.element.gauss_weights, dtype=dtype)
    C = jnp.asarray(material.C, dtype=dtype)
    rhs = jnp.asarray(rhs_np, dtype=dtype)
    fixed_d = jnp.asarray(fixed)
    sval_d = jnp.asarray(sval, dtype=dtype)

    n_dof = mesh.n_dof
    width = pattern.width if pattern is not None else 0

    # all large arrays are jit ARGUMENTS (closure capture would bake them
    # into the compiled module as constants -- fatal with remote compile)
    use_dia = dia is not None
    arrs = dict(
        nodes=nodes, elements=elements, dN=dN, w=w, C=C,
        rhs=rhs, fixed=fixed_d, sval=sval_d,
    )
    plan = None
    mg = None
    spmv = None
    if use_dia:
        offsets, diag_idx, n_off = dia.offsets, dia.diag_idx, dia.n_offsets
        if os.environ.get("BENCH_SPMV", "auto") != "slices":
            spmv = make_spmv(n_dof, offsets, dtype=dtype)
            log(f"pallas spmv: {'enabled' if spmv else 'unavailable'}")
        if structured:
            plan = build_structured_plan(mesh, dia)
            log("using the dense structured (scatter-free) assembly path")
        else:
            arrs["targets"] = jnp.asarray(dia.scatter_targets)
        if plan is not None and os.environ.get("BENCH_MG", "1") == "1":
            t0 = time.time()
            try:
                mg = StructuredMultigrid(mesh, material, fixed, dia=dia)
            except ValueError as e:
                # grid not dyadically coarsenable (e.g. NX=58) -> Jacobi
                log(f"multigrid unavailable ({e}); using Jacobi")
            else:
                arrs["mg_ops"] = mg.operands()
                log(
                    f"multigrid preconditioner: levels "
                    f"{[l.grid for l in mg.levels]} "
                    f"({time.time() - t0:.0f}s setup)"
                )
    else:
        arrs["targets"] = jnp.asarray(pattern.scatter_targets)
        arrs["colidx"] = jnp.asarray(pattern.colidx)
        arrs["diag_slot"] = jnp.asarray(pattern.diag_slot)

    @jax.jit
    def assemble(a):
        if plan is not None:
            from femcy_tpu.structured import structured_assemble_coords

            return structured_assemble_coords(
                a["nodes"], mesh, a["dN"], a["w"], a["C"], plan,
                C_host=np.asarray(material.C),
            )
        dsdx, vol = assembly.gradients_and_volume(
            a["nodes"], a["elements"], a["dN"], a["w"]
        )
        Ke = assembly.element_stiffness(dsdx, vol, a["C"])
        if use_dia:
            return dia_scatter(Ke, a["targets"], n_dof, n_off)
        return assembly.scatter_stiffness(Ke, a["targets"], n_dof, width)

    # BC + CG as a second program (one fused program peaks over HBM at the
    # 1M scale; the values array is donated to keep memory flat)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def bc_and_solve(values, a):
        if use_dia:
            values, b = dia_dirichlet_linear(
                values, offsets, diag_idx, a["rhs"], a["fixed"], a["sval"]
            )
            if mg is not None:
                return mg.pcg_solve(
                    values, b, eps=1.0e-3, ops=a["mg_ops"], spmv=spmv
                )
            block_dm = 3 if os.environ.get("BENCH_PRECOND", "scalar") == "block" else 0
            return dia_pcg_solve(
                values, offsets, diag_idx, b, eps=1.0e-3, block_dm=block_dm,
                spmv=spmv,
            )
        values, b = bc_mod.apply_dirichlet_linear(
            values, a["colidx"], a["diag_slot"], a["rhs"], a["fixed"], a["sval"]
        )
        return pcg_solve(values, a["colidx"], a["diag_slot"], b, eps=1.0e-3)

    def assemble_and_solve(a):
        return bc_and_solve(assemble(a), a)

    # ---- warmup / compile -------------------------------------------------
    t0 = time.time()
    sync(assemble(arrs))
    log(f"assembly compile+run: {time.time() - t0:.1f}s")
    t0 = time.time()
    x, iters, rmax = assemble_and_solve(arrs)
    sync(x)
    log(
        f"assemble+solve compile+run: {time.time() - t0:.1f}s "
        f"(CG iters={int(iters)}, rmax={float(rmax):.3e})"
    )
    assert np.isfinite(np.asarray(x)).all()

    # ---- timed ------------------------------------------------------------
    t_asm = []
    for _ in range(reps):
        t0 = time.time()
        sync(assemble(arrs))
        t_asm.append(time.time() - t0)
    t_solve = []
    for _ in range(reps):
        t0 = time.time()
        out = assemble_and_solve(arrs)
        sync(out[0])
        t_solve.append(time.time() - t0)

    asm = min(t_asm)
    total = min(t_solve)
    melems = mesh.n_elements / asm / 1e6
    dof_iters = mesh.n_dof * int(iters) / (total - asm) / 1e6
    log(
        f"assembly: {asm:.3f}s ({melems:.2f} M-elem/s); "
        f"assemble+CG: {total:.3f}s ({dof_iters:.1f} M dof-iters/s)"
    )

    emit(
        f"c3d4_{mesh.n_elements//1000}k_assemble_pcg",
        round(total, 4), "s", round(10.0 / total, 3),
    )


if __name__ == "__main__":
    main()
