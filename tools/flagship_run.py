"""Flagship end-to-end run on the real TPU chip: SVGP at N=1e6, M=2048.

Not a micro-benchmark - trains to convergence with Adam via
DataParallelTrainer.run_steps (50 steps per dispatch), then evaluates
held-out RMSE / NLPD and cached-posterior serving throughput. Records the
wall-clock of the WHOLE pipeline (data gen excluded).

    cd /tmp && PYTHONPATH=/root/repo:/root/.axon_site python /root/repo/tools/flagship_run.py
"""
import os
os.environ.setdefault("GPFLOW_TPU_DISABLE_X64", "1")
os.environ.setdefault("GPFLOW_FLOAT", "float32")
os.environ.setdefault("GPFLOW_TPU_FAST_MATMUL", "1")

import time
import numpy as np
import jax
import jax.numpy as jnp
import optax

import gpflow_tpu as gpf
from gpflow_tpu.models import SVGP
from gpflow_tpu.parallel import DataParallelTrainer, make_mesh

N, D, M, B = 1_000_000, 8, 2048, 8192
STEPS, CHUNK = 4000, 50
rng = np.random.RandomState(0)


def true_fn(X):
    return (
        np.sin(3 * X[:, :1])
        + 0.5 * np.cos(2 * X[:, 1:2] + X[:, 2:3])
        + 0.3 * X[:, 3:4] * X[:, 4:5]
    )


print("generating data...")
X = rng.randn(N, D).astype(np.float32)
Y = (true_fn(X) + 0.1 * rng.randn(N, 1)).astype(np.float32)
Xtest = rng.randn(20_000, D).astype(np.float32)
Ytest = (true_fn(Xtest) + 0.1 * rng.randn(len(Xtest), 1)).astype(np.float32)

model = SVGP(
    kernel=gpf.kernels.SquaredExponential(lengthscales=np.ones(D, np.float32)),
    likelihood=gpf.likelihoods.Gaussian(0.5),
    inducing_variable=X[rng.choice(N, M, replace=False)].copy(),
    num_data=N,
)

t0 = time.perf_counter()
trainer = DataParallelTrainer(model, optimizer=optax.adam(3e-3), mesh=make_mesh())
trainer.stage_data((X, Y))  # one 36 MB transfer; batches are sampled in-graph

losses = []
for chunk_start in range(0, STEPS, CHUNK):
    chunk_losses = trainer.run_steps_sampled(CHUNK, B)
    losses.append(chunk_losses)  # device arrays; don't force a sync per chunk
    if (chunk_start // CHUNK) % 16 == 0:
        print(f"step {chunk_start:5d}: loss {float(chunk_losses[-1]):.1f}")
losses = np.concatenate([np.asarray(l) for l in losses])
trainer.finalize()
train_time = time.perf_counter() - t0
print(f"\ntrained {STEPS} steps in {train_time:.1f}s = {STEPS/train_time:.0f} steps/s "
      f"end-to-end (device-resident data, in-graph batch sampling)")

# held-out quality through the cached posterior
post = model.posterior()
predict = jax.jit(lambda x: post.predict_f(x))
mu, var = predict(jnp.asarray(Xtest))
mu, var = np.asarray(mu), np.asarray(var)
noise = float(model.likelihood.variance.value)
rmse = float(np.sqrt(np.mean((mu - Ytest) ** 2)))
# f32 fast-matmul rounding can leave tiny negative predictive variances
tot_var = np.maximum(var, 0.0) + noise
nlpd = float(np.mean(0.5 * np.log(2 * np.pi * tot_var) + 0.5 * (Ytest - mu) ** 2 / tot_var))
print(f"held-out RMSE {rmse:.4f} (noise std 0.1), NLPD {nlpd:.4f}")
print(f"learned noise std {np.sqrt(noise):.4f}")

# serving throughput on the trained model
def timed(fn, x, reps=100):
    def body(c, _):
        out = fn(c)
        m = out[0] if isinstance(out, tuple) else out
        return c + 0.0 * m[0, 0], ()
    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=reps)[0])
    run(x).block_until_ready()
    t0 = time.perf_counter(); run(x).block_until_ready(); t1 = time.perf_counter()
    return (t1 - t0) / reps

xb = jnp.asarray(Xtest[:B])
t_pred = timed(predict, xb)
print(f"cached predict_f: {t_pred*1e3:.3f} ms/{B} = {B/t_pred/1e6:.1f}M pts/s")

ok = rmse < 0.2 and np.isfinite(losses).all()
print("FLAGSHIP RUN:", "OK" if ok else "FAIL")
import sys
sys.exit(0 if ok else 1)
