"""Monitoring and checkpointing a training run (mirrors the reference's
monitoring + saving_and_loading notebooks): scheduled Monitor task groups
writing TensorBoard scalars, plus periodic orbax checkpoints through an
ExecuteCallback — and restoring the best state afterwards.

The Monitor architecture (``gpflow_tpu/monitor/``), mirroring the
reference's exactly:

* a ``MonitorTask`` does one thing when called with the step index —
  ``ModelToTensorBoard`` walks the model and logs every parameter,
  ``ScalarToTensorBoard`` logs a named closure's value,
  ``ExecuteCallback`` runs arbitrary Python (used here for best-loss
  checkpointing);
* a ``MonitorTaskGroup`` holds tasks plus a ``period`` — run every N
  steps. Group cheap tasks (scalars) with period 1 and expensive ones
  (full-model dump, image rendering) with a long period;
* ``Monitor(group1, group2, ...)`` is the single callable you invoke as
  ``monitor(step)`` inside the training loop.

Two TPU-relevant practices shown below:
* The training step stays a compiled function; monitoring happens OUTSIDE
  it, reading values only at monitor steps. Never log from inside jit —
  a host callback in the hot loop serializes the device pipeline. At
  period p, you pay one device->host sync every p steps and nothing
  otherwise.
* The best-checkpoint pattern: track the best seen loss in host state and
  snapshot with ``save_checkpoint`` only on improvement; after training,
  ``load_checkpoint`` restores that state regardless of where the last
  step wandered. For long runs this doubles as preemption insurance —
  checkpoints are atomic (orbax), so a killed run resumes from the last
  completed snapshot (the distributed trainer adds elastic re-sharding on
  top; see PERFORMANCE.md).

TensorBoard event files land in ``log_dir`` (written via
``torch.utils.tensorboard.SummaryWriter`` — the TF-free event writer);
run ``tensorboard --logdir <dir>`` to view.
"""
import tempfile

import numpy as np
import optax

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.monitor import (
    ExecuteCallback,
    Monitor,
    MonitorTaskGroup,
    ModelToTensorBoard,
    ScalarToTensorBoard,
)
from gpflow_tpu.utilities import load_checkpoint, save_checkpoint

STEPS = reduce_in_tests(60, 8)


def main() -> None:
    rng = np.random.RandomState(0)
    N = 256
    X = rng.rand(N, 1) * 4
    Y = np.sin(2 * X) + 0.1 * rng.randn(N, 1)

    model = gpf.models.SVGP(
        kernel=gpf.kernels.SquaredExponential(),
        likelihood=gpf.likelihoods.Gaussian(0.1),
        inducing_variable=X[::16].copy(),
        num_data=N,
    )

    log_dir = tempfile.mkdtemp(prefix="gp-monitor-")
    ckpt_dir = tempfile.mkdtemp(prefix="gp-ckpt-")
    state = {"loss": np.inf}

    def checkpoint_if_best(loss=None, **_):
        if loss is not None and loss < state["loss"]:
            state["loss"] = loss
            save_checkpoint(f"{ckpt_dir}/best", model)

    fast = MonitorTaskGroup(
        [
            ScalarToTensorBoard(log_dir, lambda **kw: kw.get("loss", 0.0), "training_loss"),
            ExecuteCallback(checkpoint_if_best),
        ],
        period=1,
    )
    slow = MonitorTaskGroup(ModelToTensorBoard(log_dir, model), period=10)
    monitor = Monitor(fast, slow)

    import jax

    params = list(model.trainable_parameters)
    opt = optax.adam(0.05)

    def loss_fn(unc):
        old = [p._unconstrained for p in params]
        try:
            for p, u in zip(params, unc):
                p._unconstrained = u
            return model.training_loss((X, Y))
        finally:
            for p, o in zip(params, old):
                p._unconstrained = o

    unc = tuple(p._unconstrained for p in params)
    opt_state = opt.init(unc)

    @jax.jit
    def step(unc, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(unc)
        upd, opt_state = opt.update(g, opt_state, unc)
        return tuple(u + du for u, du in zip(unc, upd)), opt_state, loss

    for i in range(STEPS):
        new_unc, opt_state, loss = step(unc, opt_state)
        # `loss` is evaluated at `unc`, which the model still holds - monitor
        # (and checkpoint) BEFORE assigning the updated parameters so the
        # recorded loss matches the checkpointed state.
        monitor(i, loss=float(loss))
        unc = new_unc
        for p, u in zip(params, unc):
            p.assign_unconstrained(u)

    print(f"last monitored loss {float(loss):.2f}; best checkpointed loss {state['loss']:.2f}")

    # restore the best checkpoint into a FRESH model
    fresh = gpf.models.SVGP(
        kernel=gpf.kernels.SquaredExponential(),
        likelihood=gpf.likelihoods.Gaussian(0.1),
        inducing_variable=X[::16].copy(),
        num_data=N,
    )
    load_checkpoint(f"{ckpt_dir}/best", fresh)
    restored_loss = float(fresh.training_loss((X, Y)))
    print(f"restored model loss {restored_loss:.2f}")
    assert abs(restored_loss - state["loss"]) < 1.0


if __name__ == "__main__":
    main()
