"""Multi-chip scale-out (new first-class design work; the reference has no
distributed runtime — SURVEY.md §2.14, §5).

Strategy (SURVEY.md §7.1): data-parallel sharding of the N/batch dimension
over a ``jax.sharding.Mesh``; variational/hyper parameters and the [M, M]
inducing state replicated. XLA propagates the shardings through the ELBO and
inserts the ICI collectives (psum of per-device variational-expectation
partial sums and of gradients) automatically.

For multioutput models a second, model-parallel axis is available: build a
2-D mesh with ``make_mesh(shape={"data": d, "latent": l})`` and pass
``latent_axis="latent"`` to ``DataParallelTrainer`` — the L latent GPs'
[L, M, M] variational state, per-latent Choleskys, and natural-gradient
conversions are then sharded over that axis (compute and memory both scale
in L, which a pure data mesh cannot do).
"""
from .mesh import make_hybrid_mesh, make_mesh, replicated, shard_batch
from .sharded import shard_internal_data, sharded_predict_f
from .trainer import DataParallelTrainer

__all__ = [
    "DataParallelTrainer",
    "make_hybrid_mesh",
    "make_mesh",
    "replicated",
    "shard_batch",
    "shard_internal_data",
    "sharded_predict_f",
]
