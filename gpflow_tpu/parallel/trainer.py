"""Data-parallel training driver for minibatch models (SVGP & friends).

The training step is one jit-compiled pure function over (params, opt_state,
leaves, batch): params/opt_state/static model leaves replicated, batch sharded
over the mesh's data axis. XLA's sharding propagation turns the ELBO's
``sum(var_exp)`` and the parameter gradients into ICI ``psum``s — no explicit
collectives needed (SURVEY.md §7.1: "batch-dim sharding, psum ELBO/grads").

Buffers are donated between steps, so parameters and optimizer state stay
device-resident for the whole training run; only the scalar loss returns to
host.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import NamedSharding, PartitionSpec

from ..base import Module, Parameter
from .mesh import DEFAULT_AXIS, make_mesh, replicated, shard_batch

__all__ = ["DataParallelTrainer"]


class DataParallelTrainer:
    """Runs data-parallel optimization steps on a model with an
    ``ExternalDataTrainingLossMixin``-style ``_training_loss(batch)``.

    :param model: the model (e.g. SVGP). Its trainable parameters are
        optimized; everything else is closed over as replicated constants.
    :param optimizer: an optax GradientTransformation (default adam(1e-2)).
    :param mesh: a 1-D jax Mesh; defaults to all local devices.
    """

    def __init__(
        self,
        model: Module,
        optimizer: Optional[Any] = None,
        mesh=None,
        axis_name: str = DEFAULT_AXIS,
        donate: bool = True,
        natgrad_gamma: Optional[float] = None,
        latent_axis: Optional[str] = None,
        natgrad_fused: bool = False,
    ) -> None:
        """:param natgrad_gamma: if set and the model has full-covariance
        (q_mu, q_sqrt) variational parameters, each step first takes a
        natural-gradient step of this size on them (inside the same jitted
        program), and the gradient optimizer handles only the remaining
        parameters — the canonical natgrad+Adam recipe, sharded.

        In f32, run this path with ``GPFLOW_TPU_FAST_MATMUL`` unset or
        ``=high``: raw bf16 matmuls (``=1``) corrupt the predictive-variance
        cancellation at M>=1024, which quadrature likelihoods turn into a
        clamped (zero-variance) integrand. Non-finite natgrad steps are
        rejected in-graph (see ``NaturalGradient._natgrad_values``), so a
        too-large gamma stalls q-updates rather than NaN-ing the run.

        :param natgrad_fused: compute the natural-gradient and
            hyperparameter gradients in ONE forward+backward at the same
            point (simultaneous update) instead of the reference's
            sequential NaturalGradient-then-Adam pattern (two backward
            passes, hyper grads after the q update). ~1.3-1.5x per-step
            throughput on the non-conjugate path; trajectories differ per
            step but converge to the same optimum.

        :param latent_axis: name of a second mesh axis over which the L
            latent GPs are model-parallel-sharded (build the mesh with
            ``make_mesh(shape={"data": d, "latent": l})``). The variational
            state is placed sharded on its L dimension - q_mu [M, L] on
            columns, q_sqrt [L, M, M] (or diag [M, L]) on the batch dim -
            and XLA's sharding propagation keeps the per-latent [L, M, M]
            Choleskys, conditionals, and natural-gradient conversions
            distributed, inserting ICI collectives only where outputs mix
            (e.g. LinearCoregionalization's W-mixing and the final ELBO
            reduction). Each device then does L/l of the M^3 work and holds
            L/l of the [L, M, M] state: compute AND memory scale in the
            latent direction, which a pure data mesh cannot do."""
        import optax

        if natgrad_fused and natgrad_gamma is None:
            raise ValueError(
                "natgrad_fused=True requires natgrad_gamma (there is no "
                "natural-gradient step to fuse without it)"
            )
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
        self.axis_name = axis_name
        self.optimizer = optimizer if optimizer is not None else optax.adam(1e-2)
        self.natgrad_gamma = natgrad_gamma

        leaves, treedef = jax.tree_util.tree_flatten(model)
        self._treedef = treedef
        train_params = list(model.trainable_parameters)
        natgrad_idx: Tuple[int, ...] = ()
        if natgrad_gamma is not None:
            q_mu = getattr(model, "q_mu", None)
            q_sqrt = getattr(model, "q_sqrt", None)
            if q_mu is None or q_sqrt is None or q_sqrt.value.ndim != 3:
                raise ValueError(
                    "natgrad_gamma requires the model to have q_mu and a "
                    "full-covariance q_sqrt ([L, M, M])"
                )
            variational_ids = {id(q_mu.unconstrained_variable), id(q_sqrt.unconstrained_variable)}
            train_params = [
                p for p in train_params
                if id(p.unconstrained_variable) not in variational_ids
            ]
            # indices ordered as (q_mu, q_sqrt)
            natgrad_idx = (
                next(i for i, l in enumerate(leaves) if l is q_mu.unconstrained_variable),
                next(i for i, l in enumerate(leaves) if l is q_sqrt.unconstrained_variable),
            )
            self._natgrad_transforms = (q_mu.transform, q_sqrt.transform)
        self._natgrad_idx = natgrad_idx

        train_ids = {id(p.unconstrained_variable) for p in train_params}
        self._train_idx = tuple(i for i, l in enumerate(leaves) if id(l) in train_ids)
        if not self._train_idx and not natgrad_idx:
            raise ValueError("Model has no trainable parameters")

        rep = replicated(self.mesh)
        self._batch_sharding = shard_batch(self.mesh, axis_name)

        leaf_shardings = [rep] * len(leaves)
        if latent_axis is not None:
            if latent_axis not in self.mesh.axis_names:
                raise ValueError(
                    f"latent_axis {latent_axis!r} is not an axis of the mesh "
                    f"{self.mesh.axis_names}; build it with "
                    f'make_mesh(shape={{"data": d, "latent": l}})'
                )
            q_mu = getattr(model, "q_mu", None)
            q_sqrt = getattr(model, "q_sqrt", None)
            if q_mu is None or q_sqrt is None:
                raise ValueError(
                    "latent_axis requires a model with (q_mu, q_sqrt) "
                    "variational parameters (e.g. SVGP)"
                )
            n_shards = self.mesh.shape[latent_axis]
            L = q_sqrt.value.shape[0] if q_sqrt.value.ndim == 3 else q_sqrt.value.shape[-1]
            if L % n_shards:
                raise ValueError(
                    f"number of latent GPs ({L}) must be divisible by the "
                    f"latent mesh axis size ({n_shards})"
                )
            # q_mu [M, L] -> columns sharded; q_sqrt [L, M, M] -> batch dim
            # sharded (diag [M, L] -> columns, like q_mu)
            mu_spec = PartitionSpec(None, latent_axis)
            sq_spec = (
                PartitionSpec(latent_axis, None, None)
                if q_sqrt.value.ndim == 3
                else PartitionSpec(None, latent_axis)
            )
            for i, l in enumerate(leaves):
                if l is q_mu.unconstrained_variable:
                    leaf_shardings[i] = NamedSharding(self.mesh, mu_spec)
                elif l is q_sqrt.unconstrained_variable:
                    leaf_shardings[i] = NamedSharding(self.mesh, sq_spec)

        placed = [
            jax.device_put(jnp.asarray(l), s) for l, s in zip(leaves, leaf_shardings)
        ]
        self.params = tuple(placed[i] for i in self._train_idx)
        self.vparams = tuple(placed[i] for i in natgrad_idx)
        # Trainable/natgrad slots travel through (params, vparams), which are
        # DONATED. Passing the same buffers again through `leaves` would alias
        # donated inputs — XLA either refuses the donation (losing the
        # in-place update) or, should any future edit read the aliased slot,
        # fails at execute time with a donated-buffer error. The leaves
        # argument therefore carries None in those slots; ``loss_fn``
        # re-inserts the live params before unflattening.
        occupied = set(self._train_idx) | set(natgrad_idx)
        self._static_leaves = [
            None if i in occupied else l for i, l in enumerate(placed)
        ]
        # init under jit: ONE device dispatch — eager init issues one RPC per
        # state leaf, which is minutes of setup on a remote-attached chip.
        # Under jit zeros_like lowers to a data-independent broadcast, so
        # GSPMD does NOT propagate the params' shardings into the state; in
        # the 1-D (all-replicated) case the compiler default is replicated
        # anyway, but latent-sharded params need their optimizer state
        # explicitly re-placed or each device would hold FULL mu/nu copies,
        # defeating the memory-scales-in-L guarantee.
        self.opt_state = jax.jit(self.optimizer.init)(self.params)
        param_shardings = [leaf_shardings[i] for i in self._train_idx]
        # Explicitly place EVERY state leaf: jit(init)'s outputs carry no
        # sharding constraint, and on a sub-mesh (fewer devices than visible,
        # e.g. restoring a checkpoint onto half the slice) XLA parks them on
        # one device, which then conflicts with the mesh-placed params at the
        # first step. Default replicated; latent-sharded params map their
        # state leaves to the matching sharding by (shape, dtype) — skip
        # ambiguous signatures (same shape+dtype under different shardings),
        # which keep replicated.
        sig = {}
        if any(s is not rep for s in param_shardings):
            for p, s in zip(self.params, param_shardings):
                key = (tuple(p.shape), jnp.result_type(p))
                sig[key] = None if key in sig and sig[key] is not s else s

        def _place(leaf):
            s = sig.get((tuple(jnp.shape(leaf)), jnp.result_type(leaf)))
            return jax.device_put(leaf, s if s is not None else rep)

        self.opt_state = jax.tree_util.tree_map(_place, self.opt_state)

        train_idx = self._train_idx
        optimizer_ = self.optimizer

        if natgrad_gamma is not None:
            from ..optimizers.natgrad import NaturalGradient

            natgrad_ = NaturalGradient(gamma=natgrad_gamma)
            mu_t, sq_t = self._natgrad_transforms

        def loss_fn(params, vparams, leaves, batch):
            leaves = list(leaves)
            for i, p in zip(train_idx, params):
                leaves[i] = p
            for i, p in zip(natgrad_idx, vparams):
                leaves[i] = p
            m = jax.tree_util.tree_unflatten(treedef, leaves)
            return m._training_loss(batch)

        donate_argnums = (0, 1, 2) if donate else ()

        @jax.jit
        def _eval_loss(params, vparams, leaves, batch):
            return loss_fn(params, vparams, leaves, batch)

        self._eval_loss = _eval_loss

        def _natgrad_update(vparams, vgrads):
            mean_new, varsqrt_new, ok = natgrad_._natgrad_values_with_ok(
                vgrads[0], vgrads[1],
                mu_t.forward(vparams[0]), sq_t.forward(vparams[1]),
                mu_t, sq_t, natgrad_.xi_transform,
            )
            return (mu_t.inverse(mean_new), sq_t.inverse(varsqrt_new)), (~ok).astype(jnp.int32)

        def train_step(params, vparams, opt_state, leaves, batch):
            rejected = jnp.zeros((), jnp.int32)
            if natgrad_idx and natgrad_fused and train_idx:
                # ONE forward+backward for both gradient sets, evaluated at
                # the same point (simultaneous update). The sequential mode
                # below matches the reference's NaturalGradient-then-Adam
                # pattern (hyper grads AFTER the q update) at the cost of a
                # second backward pass.
                loss, (grads, vgrads) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                    params, vparams, leaves, batch
                )
                vparams, rejected = _natgrad_update(vparams, vgrads)
                updates, opt_state = optimizer_.update(grads, opt_state, params)
                params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
                return params, vparams, opt_state, loss, rejected
            if natgrad_idx:
                # natural-gradient step on (q_mu, q_sqrt) at current hypers
                vgrads = jax.grad(
                    lambda vp: loss_fn(params, vp, leaves, batch)
                )(vparams)
                vparams, rejected = _natgrad_update(vparams, vgrads)
            if train_idx:
                loss, grads = jax.value_and_grad(loss_fn)(params, vparams, leaves, batch)
                updates, opt_state = optimizer_.update(grads, opt_state, params)
                params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            else:
                loss = loss_fn(params, vparams, leaves, batch)
            return params, vparams, opt_state, loss, rejected

        self._train_step = jax.jit(train_step, donate_argnums=donate_argnums)
        self._natgrad_rejections = 0
        self._pending_rejections: list = []
        self._sample_counter = 0

        def multi_step(params, vparams, opt_state, leaves, batches):
            """K steps in one device dispatch via lax.scan — amortizes the
            host->device round trip (dominant on remote-attached TPUs)."""

            def body(carry, batch):
                params, vparams, opt_state = carry
                params, vparams, opt_state, loss, rejected = train_step(
                    params, vparams, opt_state, leaves, batch
                )
                return (params, vparams, opt_state), (loss, rejected)

            (params, vparams, opt_state), (losses, rejected) = jax.lax.scan(
                body, (params, vparams, opt_state), batches
            )
            return params, vparams, opt_state, losses, jnp.sum(rejected)

        self._multi_step = jax.jit(multi_step, donate_argnums=donate_argnums)

        def multi_step_sampled(params, vparams, opt_state, leaves, data, keys, batch_size):
            """K steps with ON-DEVICE minibatch sampling from a device-resident
            dataset: per step, uniform indices are drawn in-graph and the rows
            gathered and sharding-constrained to the data axis. Avoids
            shipping every batch over the host link (dominant for
            remote-attached chips: staging K x [B, D] batches costs more than
            the compute at production shapes)."""
            Xall, Yall = data

            def body(carry, key):
                params, vparams, opt_state = carry
                idx = jax.random.randint(key, (batch_size,), 0, Xall.shape[0])
                batch = tuple(
                    jax.lax.with_sharding_constraint(a[idx], self._batch_sharding)
                    for a in (Xall, Yall)
                )
                params, vparams, opt_state, loss, rejected = train_step(
                    params, vparams, opt_state, leaves, batch
                )
                return (params, vparams, opt_state), (loss, rejected)

            (params, vparams, opt_state), (losses, rejected) = jax.lax.scan(
                body, (params, vparams, opt_state), keys
            )
            return params, vparams, opt_state, losses, jnp.sum(rejected)

        self._multi_step_sampled = jax.jit(
            multi_step_sampled,
            static_argnums=(6,),
            donate_argnums=donate_argnums,
        )
        self._staged_data: Optional[Tuple[jax.Array, ...]] = None

    @property
    def natgrad_rejections(self) -> int:
        """Number of natural-gradient steps rejected so far (non-finite
        conversion — the step left the negative-definite cone — state kept;
        see ``NaturalGradient._natgrad_values_with_ok``). A persistently
        growing count means ``natgrad_gamma`` is too large. Reading this
        syncs any pending device counters to host."""
        if self._pending_rejections:
            self._natgrad_rejections += int(sum(int(r) for r in self._pending_rejections))
            self._pending_rejections = []
        return self._natgrad_rejections

    def _record_rejections(self, rejected) -> None:
        """Tracks in-graph natgrad step rejections without unbounded growth:
        no-op when natgrad is off (the counter is identically zero), and the
        pending device scalars are folded into the host counter every 1024
        dispatches (by then the oldest scalar has long finished computing,
        so the int() sync does not stall the pipeline)."""
        if not self._natgrad_idx:
            return
        self._pending_rejections.append(rejected)
        if len(self._pending_rejections) >= 1024:
            self._natgrad_rejections += int(
                sum(int(r) for r in self._pending_rejections)
            )
            self._pending_rejections = []

    def shard(self, batch: Tuple[Any, ...]) -> Tuple[Any, ...]:
        """Places a (X, Y) batch sharded over the data axis."""
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), self._batch_sharding), batch
        )

    def step(self, batch: Tuple[Any, ...], presharded: bool = False) -> jax.Array:
        """One optimization step; returns the (device-resident scalar) loss."""
        if not presharded:
            batch = self.shard(batch)
        self.params, self.vparams, self.opt_state, loss, rejected = self._train_step(
            self.params, self.vparams, self.opt_state, self._static_leaves, batch
        )
        self._record_rejections(rejected)
        return loss

    def shard_stacked(self, batches: Tuple[Any, ...]) -> Tuple[Any, ...]:
        """Stages stacked batches [K, B, ...] on device, B sharded over the
        mesh (use to prefetch ahead of ``run_steps``)."""
        sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(None, self.axis_name)
        )
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), sharding), batches
        )

    def run_steps(self, batches: Tuple[Any, ...], presharded: bool = False) -> jax.Array:
        """Runs K steps in ONE device call. ``batches`` is an (X, Y) tuple with
        a leading scan axis: X [K, B, D], Y [K, B, P] (B sharded over the
        mesh). Returns the per-step losses [K]."""
        if not presharded:
            batches = self.shard_stacked(batches)
        self.params, self.vparams, self.opt_state, losses, rejected = self._multi_step(
            self.params, self.vparams, self.opt_state, self._static_leaves, batches
        )
        self._record_rejections(rejected)
        return losses

    def stage_data(self, data: Tuple[Any, ...]) -> None:
        """Places the FULL training set on device (replicated), once, for
        ``run_steps_sampled``. At SVGP production shapes the dataset (e.g.
        N=1e6, D=8 f32 = 32 MB) is far smaller than the batches shipped per
        epoch, so device-resident data + in-graph sampling is the fast path
        on remote-attached chips."""
        rep = replicated(self.mesh)
        self._staged_data = tuple(
            jax.device_put(jnp.asarray(a), rep) for a in data
        )

    def run_steps_sampled(
        self, n_steps: int, batch_size: int, key: Optional[jax.Array] = None
    ) -> jax.Array:
        """Runs ``n_steps`` optimizer steps in ONE device call, sampling each
        minibatch uniformly (with replacement) from the staged dataset
        in-graph. Call ``stage_data`` first. Returns per-step losses."""
        if self._staged_data is None:
            raise ValueError("Call stage_data(data) before run_steps_sampled")
        if key is None:
            key = jax.random.PRNGKey(self._sample_counter)
            self._sample_counter += 1
        keys = jax.random.split(key, n_steps)
        (
            self.params, self.vparams, self.opt_state, losses, rejected
        ) = self._multi_step_sampled(
            self.params, self.vparams, self.opt_state, self._static_leaves,
            self._staged_data, keys, batch_size,
        )
        self._record_rejections(rejected)
        return losses

    def loss(self, batch: Tuple[Any, ...], presharded: bool = False) -> jax.Array:
        if not presharded:
            batch = self.shard(batch)
        return self._eval_loss(self.params, self.vparams, self._static_leaves, batch)

    def finalize(self) -> None:
        """Writes the optimized parameter values back into the model."""
        leaves = list(self._static_leaves)
        for i, p in zip(self._train_idx, self.params):
            leaves[i] = p
        for i, p in zip(self._natgrad_idx, self.vparams):
            leaves[i] = p
        updated = jax.tree_util.tree_unflatten(self._treedef, leaves)
        for target, source in zip(self.model.parameters, updated.parameters):
            target.assign_unconstrained(source.unconstrained_variable)

    # ------------------------------------------------------------------
    # Sharded-training checkpointing (VERDICT r4 #6; reference analog:
    # doc/sphinx/notebooks/getting_started/saving_and_loading.pct.py:103-190,
    # which delegates to tf.train.Checkpoint — here the training state is a
    # device-sharded pytree, so save pulls it to host and load re-places it
    # under the NEW trainer's mesh/shardings, which may have a different
    # device count: parameters and optimizer state are replicated (or
    # latent-sharded) along axes independent of the data axis, so a state
    # saved on an 8-device mesh restores bit-identically onto 4 devices.)
    # ------------------------------------------------------------------

    def state_dict(self) -> Dict[str, Any]:
        """Host-side snapshot of the full optimization state
        (trainable params, natgrad params, optimizer state)."""
        import numpy as np

        state = {"params": self.params, "vparams": self.vparams,
                 "opt_state": self.opt_state}
        leaves = jax.tree_util.tree_leaves(state)
        return {f"leaf_{i:04d}": np.asarray(jax.device_get(l))
                for i, l in enumerate(leaves)}

    def load_state_dict(self, host_state: Dict[str, Any]) -> None:
        """Restores a :meth:`state_dict` snapshot into this trainer,
        re-placing every leaf with this trainer's own sharding (the saving
        trainer's mesh may have had a different device count)."""
        state = {"params": self.params, "vparams": self.vparams,
                 "opt_state": self.opt_state}
        leaves, treedef = jax.tree_util.tree_flatten(state)
        saved = [host_state[k] for k in sorted(host_state)]
        if len(saved) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(saved)} leaves, trainer state has "
                f"{len(leaves)} — model/optimizer structure mismatch"
            )
        placed = []
        for cur, new in zip(leaves, saved):
            if tuple(jnp.shape(cur)) != tuple(new.shape):
                raise ValueError(
                    f"checkpoint leaf shape {new.shape} != trainer leaf "
                    f"shape {jnp.shape(cur)}"
                )
            placed.append(jax.device_put(jnp.asarray(new, jnp.result_type(cur)),
                                         cur.sharding))
        restored = jax.tree_util.tree_unflatten(treedef, placed)
        self.params = restored["params"]
        self.vparams = restored["vparams"]
        self.opt_state = restored["opt_state"]

    def save_state(self, path: str) -> None:
        """Saves the optimization state to ``path`` (orbax directory
        checkpoint when available, .npz fallback)."""
        host = self.state_dict()
        try:
            import orbax.checkpoint as ocp

            import os

            checkpointer = ocp.PyTreeCheckpointer()
            checkpointer.save(os.path.abspath(path), host, force=True)
        except ImportError:  # pragma: no cover - orbax is baked in
            import numpy as np

            np.savez(path if path.endswith(".npz") else path + ".npz", **host)

    def load_state(self, path: str) -> None:
        """Restores a :meth:`save_state` checkpoint (possibly written under a
        different mesh shape) into this trainer."""
        try:
            import orbax.checkpoint as ocp

            import os

            checkpointer = ocp.PyTreeCheckpointer()
            host = checkpointer.restore(os.path.abspath(path))
        except ImportError:  # pragma: no cover
            import numpy as np

            npz = np.load(path if path.endswith(".npz") else path + ".npz")
            host = {k: npz[k] for k in npz.files}
        self.load_state_dict(host)
