"""Multi-chip scaling via jax.sharding.

The reference is single-GPU by design (SURVEY.md §2.8); this package
provides what it lacks: batch-sharded data parallelism over the ICI mesh.
Params are replicated, the batch axis is sharded, and XLA inserts the
gradient ``psum`` — the idiomatic TPU scaling path.
"""

from .data_parallel import DataParallelTrainer, make_mesh

__all__ = ["DataParallelTrainer", "make_mesh"]
