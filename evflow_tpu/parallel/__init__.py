from . import mesh, tiling
