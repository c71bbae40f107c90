"""Bucketed batching for variable-size inputs under jit.

JAX/XLA programs are static-shape: every distinct batch size N triggers a
fresh trace+compile (the reference's TF graphs supported unknown-N
natively, reference ``models/vgp.py:81-101`` / SURVEY.md A.5.1 — this
module is the documented TPU-native replacement). ``bucketize`` wraps any
``fn(X, ...) -> array/tuple-of-arrays`` whose FIRST axis is the batch:
inputs are zero-padded up to the next bucket size, so the wrapped function
compiles once per BUCKET instead of once per distinct N, and outputs are
sliced back to the true length.

    predict = bucketize(jax.jit(lambda x: posterior.predict_f(x)))
    predict(X_with_any_N)   # compiles at most len(buckets) times

Default buckets are powers of two — a serving batch stream of arbitrary
sizes costs at most log2(N_max) compilations.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bucket_size_for", "bucketize", "pad_to_bucket"]


def bucket_size_for(n: int, buckets: Optional[Sequence[int]] = None) -> int:
    """Smallest bucket >= n. Default: next power of two (min 1)."""
    if n < 0:
        raise ValueError(f"batch size must be non-negative, got {n}")
    if buckets is None:
        return 1 if n <= 1 else 1 << (n - 1).bit_length()
    for b in sorted(buckets):
        if b >= n:
            return int(b)
    raise ValueError(f"no bucket >= {n} in {sorted(buckets)}")


def pad_to_bucket(
    X: Any, buckets: Optional[Sequence[int]] = None
) -> tuple[jax.Array, int]:
    """Zero-pads the first axis up to its bucket size; returns (padded, n)."""
    X = jnp.asarray(X)
    n = X.shape[0]
    b = bucket_size_for(n, buckets)
    if b == n:
        return X, n
    pad = [(0, b - n)] + [(0, 0)] * (X.ndim - 1)
    return jnp.pad(X, pad), n


def bucketize(
    fn: Callable[..., Any],
    buckets: Optional[Sequence[int]] = None,
    unpad: str = "matching",
) -> Callable[..., Any]:
    """Wraps ``fn`` so its first argument is padded to a bucket size and
    padded output axes are sliced back to the true batch length.

    ``unpad`` selects which output axes count as batch axes:

    * ``"matching"`` (default): EVERY axis whose length equals the padded
      size — covers [b, P] means, [b] vectors, and full-covariance outputs
      like [b, b] or [P, b, b]. Caveat: a NON-batch axis that coincidentally
      equals the padded size (e.g. P outputs with P == bucket size) is
      indistinguishable from a batch axis and would be sliced — use
      ``"leading"`` in that case.
    * ``"leading"``: only axis 0 — never touches other dims; full-covariance
      outputs must then be column-unpadded by the caller.

    An output leaf with NO batch axis to slice (e.g. ``fn`` reduced over the
    batch — a mean/sum) is REJECTED with a ValueError when padding actually
    happened: the zero-pad rows already contaminated such a result, and
    returning it untouched would be silently wrong (round-2 review). Reduce
    outside the wrapper, or mask the pad rows inside ``fn``.
    """
    if unpad not in ("matching", "leading"):
        raise ValueError(f"unpad must be 'matching' or 'leading', got {unpad!r}")

    def wrapper(X: Any, *args: Any, **kwargs: Any) -> Any:
        Xp, n = pad_to_bucket(X, buckets)
        b = Xp.shape[0]
        out = fn(Xp, *args, **kwargs)
        if b == n:  # no padding happened; nothing to unpad
            return out

        def slice_(a: Any) -> Any:
            if not hasattr(a, "shape"):
                return a
            has_batch_axis = (
                getattr(a, "ndim", 0) >= 1
                and (a.shape[0] == b if unpad == "leading" else any(d == b for d in a.shape))
            )
            if not has_batch_axis:
                raise ValueError(
                    f"bucketize: output of shape {tuple(getattr(a, 'shape', ()))} has no "
                    f"axis equal to the padded batch size {b}; it was computed over "
                    f"zero-pad rows and cannot be unpadded. Return per-row outputs and "
                    f"reduce outside the wrapper (or mask rows >= n inside fn)."
                )
            if unpad == "leading":
                return a[:n]
            idx = tuple(slice(0, n) if d == b else slice(None) for d in a.shape)
            return a[idx]

        return jax.tree_util.tree_map(slice_, out)

    return wrapper
