"""User-programmable Dirichlet boundary conditions.

The reference exposes one hardcoded Taichi kernel as its UMAT-like extension
point (user_defined/user_api.py:6-30): a rigid rotation of the node set about
(40, 5, 0) by angle time*pi, dispatched when the ``.inp`` says
``*Boundary, user``.  Here the hook is a plain callable

    user_fn(nodes: (K, dm) array, dof_dim: int, time: float) -> (K,) values

passed to ``FEMSystem.solve(..., user_dirichlet=...)``; the default reproduces
the reference kernel (used by the twist benchmarks,
tests/twist/twist_plate_C3D4.inp:1559-1562).
"""

from __future__ import annotations

import numpy as np


def make_rotation_dirichlet(center, axis: str = "z"):
    """Rigid rotation about ``center`` by angle ``time * pi``.

    Written with ``jnp`` ops so the SAME callable serves both the host state
    machine (numpy inputs, float time) and the device-resident analysis loop
    (``SolverConfig.device_loop``), where ``time`` is a traced scalar inside
    one XLA program.  User-supplied hooks that should work with
    ``device_loop`` must follow the same rule: no data-dependent Python
    control flow on ``time``.
    """
    center = np.asarray(center, dtype=np.float64)

    def user_fn(nodes: np.ndarray, dof_dim: int, time) -> np.ndarray:
        import jax.numpy as jnp

        angle = time * np.pi
        c, s = jnp.cos(angle), jnp.sin(angle)
        # ref rotation matrix (user_api.py:22-26):
        # rows [cos, sin, 0; -sin, cos, 0; 0,0,1]; applied as rel @ rot.T
        rel = jnp.asarray(nodes - center[: nodes.shape[1]])
        x, y = rel[:, 0], rel[:, 1]
        new_cols = [c * x + s * y, -s * x + c * y]
        if nodes.shape[1] == 3:
            new_cols.append(rel[:, 2])
        disp = jnp.stack(new_cols, axis=1) - rel
        return disp[:, dof_dim]

    return user_fn


#: parity default: rotation about (40, 5, 0) (ref: user_api.py:18)
default_user_dirichlet = make_rotation_dirichlet((40.0, 5.0, 0.0))
