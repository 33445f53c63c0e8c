# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Mesh sharding of independent batch diagonalizations (ICI data parallelism)."""

from .batch_solver import solve_sci_batch_sharded  # noqa: F401
from .df_sharded import solve_sci_dfsharded  # noqa: F401
from .distributed import global_mesh, init_distributed, is_distributed  # noqa: F401
from .grid_sharded import default_grid_mesh, solve_sci_gridsharded  # noqa: F401
from .row_sharded import solve_sci_batch_rowsharded, solve_sci_rowsharded  # noqa: F401
from .sharded_solve import solve_sci_distributed  # noqa: F401
from .mesh import batch_sharding, default_mesh  # noqa: F401
