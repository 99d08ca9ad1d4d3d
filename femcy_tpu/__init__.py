"""femcy-tpu: a TPU-native finite-element framework (JAX / XLA / Pallas).

A ground-up re-design of the capabilities of mo-hanxuan/FEMcy for TPU:

- static-shape, fixed-topology meshes whose assembly compiles to a single
  XLA program (vmapped per-element B^T C B + one sorted segment-sum scatter),
- a Jacobi-preconditioned CG that runs entirely inside ``jax.lax.while_loop``
  (zero host round-trips per iteration),
- geometric nonlinearity (updated-Lagrangian Newton-Raphson with adaptive
  load stepping) orchestrated on host around jitted device steps,
- multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives over ICI (elements sharded for assembly, rows for SpMV).

Reference capability surface: /root/reference (FEMcy, Taichi/CUDA) -- see
SURVEY.md.  This package is an independent TPU-first implementation; files
cite the reference as ``file:line`` only to document behavioural parity.
"""

import os

# FEM needs f64 accumulation for the published accuracy targets (<=0.1%
# stress error, nu=0.4999 near-incompressible cases).  Enable x64 before any
# JAX arrays are created.  Set FEMCY_TPU_X64=0 to run in f32 (faster on TPU;
# accuracy-gated workloads should keep f64).
if os.environ.get("FEMCY_TPU_X64", "1") != "0":
    import jax

    jax.config.update("jax_enable_x64", True)

# TPU matmuls run f32 operands through the MXU at bf16 precision by DEFAULT,
# which puts ~0.7% error into every assembly einsum (measured against the
# f64 analytic operator on a uniform grid -- vastly beyond the <=0.1% stress
# gate).  Force full-f32 matmul precision framework-wide; the hot structured
# path does no dots at all (Pallas VPU kernels), so this costs only the
# general-path einsums.  FEMCY_TPU_MATMUL_PRECISION overrides (e.g.
# "default" to get the fast bf16 behaviour back).
import jax as _jax  # noqa: E402

_jax.config.update(
    "jax_default_matmul_precision",
    os.environ.get("FEMCY_TPU_MATMUL_PRECISION", "highest"),
)

# Persistent XLA compilation cache: FEM programs are large (a fused Newton
# step or device-resident analysis loop compiles 20-60 s on the remote TPU
# service) but their HLO is stable across processes for a fixed mesh --
# caching makes every run after the first skip the compile entirely
# (verified to work through the remote-TPU backend).  Set
# FEMCY_TPU_COMPILE_CACHE to a directory to enable ("" disables; default
# off to keep library behaviour unsurprising -- bench.py and the CLI
# enable it).
_cache_dir = os.environ.get("FEMCY_TPU_COMPILE_CACHE", "")
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # cache EVERY program, even trivial ones: on the remote-compile TPU
    # backend a sub-second compile still pays the shared service's queue
    # latency (observed: seconds to tens of seconds per tiny program on a
    # busy service), so the default 1 s floor leaves exactly the programs
    # that dominate a warm run uncached
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

__version__ = "0.1.0"

from femcy_tpu.config import SolverConfig  # noqa: E402
from femcy_tpu.mesh import FEMesh  # noqa: E402
from femcy_tpu.system import FEMSystem  # noqa: E402
from femcy_tpu.io.inp import (  # noqa: E402
    InpBlockModel,
    InpModel,
    read_inp,
    read_inp_multi,
)
from femcy_tpu.multiblock import (  # noqa: E402
    ElementBlock,
    MultiBlockSystem,
    system_from_model,
)
from femcy_tpu.materials import (  # noqa: E402
    LinearIsotropic,
    LinearIsotropicPlaneStress,
    LinearIsotropicPlaneStrain,
    NeoHookean,
    material_from_inp,
)
from femcy_tpu import meshgen  # noqa: E402
from femcy_tpu.beam import (  # noqa: E402
    BeamModel,
    BeamSection,
    read_beam_inp,
    solve_beam,
)
from femcy_tpu.mixed import (  # noqa: E402
    MixedModel,
    MixedSystem,
    read_mixed_inp,
    solve_mixed,
)

__all__ = [
    "BeamModel",
    "BeamSection",
    "read_beam_inp",
    "solve_beam",
    "MixedModel",
    "MixedSystem",
    "read_mixed_inp",
    "solve_mixed",
    "SolverConfig",
    "FEMesh",
    "FEMSystem",
    "InpModel",
    "read_inp",
    "InpBlockModel",
    "read_inp_multi",
    "ElementBlock",
    "MultiBlockSystem",
    "system_from_model",
    "LinearIsotropic",
    "LinearIsotropicPlaneStress",
    "LinearIsotropicPlaneStrain",
    "NeoHookean",
    "material_from_inp",
    "meshgen",
    "__version__",
]
