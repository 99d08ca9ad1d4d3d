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
    """Rigid rotation about ``center`` by angle ``time * pi`` (host, numpy)."""
    center = np.asarray(center, dtype=np.float64)

    def user_fn(nodes: np.ndarray, dof_dim: int, time: float) -> np.ndarray:
        angle = time * np.pi
        c, s = np.cos(angle), np.sin(angle)
        # ref rotation matrix (user_api.py:22-26): rows [cos, sin, 0; -sin, cos, 0; 0,0,1]
        rot = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
        rel = nodes - center[: nodes.shape[1]]
        if nodes.shape[1] == 2:
            new = rel @ rot[:2, :2].T
        else:
            new = rel @ rot.T
        disp = new - rel
        return disp[:, dof_dim]

    return user_fn


#: parity default: rotation about (40, 5, 0) (ref: user_api.py:18)
default_user_dirichlet = make_rotation_dirichlet((40.0, 5.0, 0.0))
