"""Multi-chip scaling via jax.sharding.

The reference is single-GPU by design (SURVEY.md §2.8); this package
provides what it lacks:

- :class:`DataParallelTrainer` — batch-sharded data parallelism over the
  ICI mesh (params replicated, gradient ``psum`` inserted by XLA);
- :class:`TableParallelGrid` — model parallelism for hash grids whose
  tables exceed one chip's HBM (every level row-sharded over a mesh
  axis; one feature ``psum`` per apply, table gradients device-local).

Both compose on orthogonal axes of one ``Mesh``.
"""

from .data_parallel import DataParallelTrainer, make_mesh
from .table_parallel import TableParallelGrid, TableParallelTrainer

__all__ = [
    "DataParallelTrainer",
    "TableParallelGrid",
    "TableParallelTrainer",
    "make_mesh",
]
