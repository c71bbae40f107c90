"""Multi-chip scale-out (new first-class design work; the reference has no
distributed runtime — SURVEY.md §2.14, §5).

Strategy (SURVEY.md §7.1): data-parallel sharding of the N/batch dimension
over a ``jax.sharding.Mesh``; variational/hyper parameters and the [M, M]
inducing state replicated. XLA propagates the shardings through the ELBO and
inserts the ICI collectives (psum of per-device variational-expectation
partial sums and of gradients) automatically.
"""
from .mesh import make_mesh, replicated, shard_batch
from .sharded import shard_internal_data, sharded_predict_f
from .trainer import DataParallelTrainer

__all__ = [
    "DataParallelTrainer",
    "make_mesh",
    "replicated",
    "shard_batch",
    "shard_internal_data",
    "sharded_predict_f",
]
