from femcy_tpu.io.colormap import femcy_colormap, get_color, resolve_cmap
from femcy_tpu.io.inp import DirichletBC, InpModel, NeumannBC, read_inp

__all__ = [
    "InpModel",
    "DirichletBC",
    "NeumannBC",
    "read_inp",
    "femcy_colormap",
    "get_color",
    "resolve_cmap",
]
