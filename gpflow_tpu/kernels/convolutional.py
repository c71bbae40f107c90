"""Convolutional GP kernel (reference ``/root/reference/gpflow/kernels/convolutional.py:28-176``)."""
from __future__ import annotations

from typing import Optional, Sequence, cast

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Parameter, TensorType
from ..config import default_float
from .base import Kernel
from ..utilities.shapes import check_shapes, inherit_check_shapes

__all__ = ["Convolutional"]


class Convolutional(Kernel):
    """Sum-of-patch-responses image kernel (van der Wilk et al. 2017):
    f(x) = sum_p w_p g(x^[p]) with base kernel g over patches.

    Patch extraction re-implemented with static sliding-window gathers instead
    of ``tf.image.extract_patches`` (reference ``convolutional.py:68-110``).
    """

    @check_shapes(
        "weights: [P]",
    )
    def __init__(
        self,
        base_kernel: Kernel,
        image_shape: Sequence[int],
        patch_shape: Sequence[int],
        weights: Optional[TensorType] = None,
        colour_channels: int = 1,
    ) -> None:
        super().__init__()
        self.image_shape = tuple(int(i) for i in image_shape)
        self.patch_shape = tuple(int(i) for i in patch_shape)
        self.base_kernel = base_kernel
        self.colour_channels = int(colour_channels)
        self.weights = Parameter(
            np.ones(self.num_patches, dtype=default_float()) if weights is None else weights,
            name="weights",
        )

    @check_shapes(
        "X: [batch..., N, D]",
        "return: [batch..., N, P, S]",
    )
    def get_patches(self, X: TensorType) -> jax.Array:
        """[batch..., N, D] images -> [batch..., N, P, S] patches
        (per colour channel, matching reference ``convolutional.py:68-110``)."""
        X = jnp.asarray(X)
        batch = X.shape[:-2]
        N = X.shape[-2]
        C = self.colour_channels
        W, H = self.image_shape
        pw, ph = self.patch_shape
        # [num_data, W*H*C] -> [num_data, C, W*H] -> [num_data*C, W, H]
        imgs = jnp.swapaxes(X.reshape(-1, W * H, C), -1, -2).reshape(-1, W, H)
        ow, oh = W - pw + 1, H - ph + 1
        i0 = np.arange(ow)[:, None, None, None]
        j0 = np.arange(oh)[None, :, None, None]
        di = np.arange(pw)[None, None, :, None]
        dj = np.arange(ph)[None, None, None, :]
        rows = i0 + di  # [ow, oh, pw, ph]
        cols = j0 + dj
        patches = imgs[:, rows, cols]  # [num_data*C, ow, oh, pw, ph]
        S = pw * ph
        patches = patches.reshape(-1, ow * oh, S)  # [num_data*C, n_patches, S]
        out = patches.reshape(batch + (N, C * ow * oh, S))
        return out.astype(default_float())

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        Xp = self.get_patches(X)  # [batch..., N, P, S]
        W2 = self.weights.value[:, None] * self.weights.value[None, :]  # [P, P]
        batch = Xp.shape[:-3]
        rank = len(batch)
        N, P, S = Xp.shape[-3:]
        if X2 is None:
            Xp_flat = Xp.reshape(batch + (N * P, S))
            bigK = self.base_kernel.K(Xp_flat)  # [batch..., N*P, N*P]
            bigK = bigK.reshape(batch + (N, P, N, P))
            W2r = W2.reshape((1,) * rank + (1, P, 1, P))
            return jnp.sum(bigK * W2r, axis=(rank + 1, rank + 3)) / self.num_patches ** 2.0
        Xp2 = self.get_patches(X2)  # [batch2..., N2, P, S]
        rank2 = Xp2.ndim - 3
        bigK = self.base_kernel.K(Xp, Xp2)  # [batch..., N, P, batch2..., N2, P]
        W2r = W2.reshape((1,) * rank + (1, P) + (1,) * rank2 + (1, P))
        return jnp.sum(bigK * W2r, axis=(rank + 1, rank + rank2 + 3)) / self.num_patches ** 2.0

    @inherit_check_shapes
    def K_diag(self, X: TensorType) -> jax.Array:
        Xp = self.get_patches(X)  # [batch..., N, P, S]
        rank = Xp.ndim - 3
        P = Xp.shape[-2]
        W2 = self.weights.value[:, None] * self.weights.value[None, :]
        W2r = W2.reshape((1,) * rank + (1, P, P))
        bigK = self.base_kernel.K(Xp)  # [batch..., N, P, P]
        return jnp.sum(bigK * W2r, axis=(rank + 1, rank + 2)) / self.num_patches ** 2.0

    @property
    def patch_len(self) -> int:
        return cast(int, int(np.prod(self.patch_shape)))

    @property
    def num_patches(self) -> int:
        return (
            (self.image_shape[0] - self.patch_shape[0] + 1)
            * (self.image_shape[1] - self.patch_shape[1] + 1)
            * self.colour_channels
        )
