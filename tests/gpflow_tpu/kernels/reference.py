"""Naive NumPy loop-based reference kernels (oracle pattern from reference
``tests/gpflow/kernels/reference.py``)."""
import numpy as np


def ref_rbf_kernel(X, lengthscales, signal_variance):
    N, _ = X.shape
    K = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            d = (X[i] - X[j]) / lengthscales
            K[i, j] = signal_variance * np.exp(-0.5 * np.dot(d, d))
    return K


def ref_matern12(X, lengthscales, variance):
    N = X.shape[0]
    K = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            r = np.linalg.norm((X[i] - X[j]) / lengthscales)
            K[i, j] = variance * np.exp(-r)
    return K


def ref_matern32(X, lengthscales, variance):
    N = X.shape[0]
    K = np.zeros((N, N))
    s3 = np.sqrt(3.0)
    for i in range(N):
        for j in range(N):
            r = np.linalg.norm((X[i] - X[j]) / lengthscales)
            K[i, j] = variance * (1 + s3 * r) * np.exp(-s3 * r)
    return K


def ref_matern52(X, lengthscales, variance):
    N = X.shape[0]
    K = np.zeros((N, N))
    s5 = np.sqrt(5.0)
    for i in range(N):
        for j in range(N):
            r = np.linalg.norm((X[i] - X[j]) / lengthscales)
            K[i, j] = variance * (1 + s5 * r + 5.0 / 3.0 * r ** 2) * np.exp(-s5 * r)
    return K


def ref_linear(X, variance):
    return (X * variance) @ X.T


def ref_periodic_kernel(X, base, lengthscales, signal_variance, period):
    """Periodic wrapper around an isotropic base (sine distances)."""
    N = X.shape[0]
    K = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            sines = np.sin(np.pi * (X[i] - X[j]) / period) / lengthscales
            if base == "rbf":
                K[i, j] = signal_variance * np.exp(-0.5 * np.sum(sines ** 2))
            elif base == "matern12":
                r = np.sum(np.abs(sines))
                K[i, j] = signal_variance * np.exp(-r)
            else:
                raise NotImplementedError(base)
    return K


def ref_arccosine_kernel(X, order, weight_variances, bias_variance, signal_variance):
    num_points = X.shape[0]
    kernel = np.empty((num_points, num_points))
    for row in range(num_points):
        for col in range(num_points):
            x = X[row]
            y = X[col]

            numerator = (weight_variances * x).dot(y) + bias_variance

            x_denominator = np.sqrt((weight_variances * x).dot(x) + bias_variance)
            y_denominator = np.sqrt((weight_variances * y).dot(y) + bias_variance)
            denominator = x_denominator * y_denominator

            theta = np.arccos(np.clip(numerator / denominator, -1.0, 1.0))
            if order == 0:
                J = np.pi - theta
            elif order == 1:
                J = np.sin(theta) + (np.pi - theta) * np.cos(theta)
            else:
                J = 3.0 * np.sin(theta) * np.cos(theta)
                J += (np.pi - theta) * (1.0 + 2.0 * np.cos(theta) ** 2)

            kernel[row, col] = (
                signal_variance
                * (1.0 / np.pi)
                * J
                * denominator ** order
            )
    return kernel
