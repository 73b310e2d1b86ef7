"""Shared layer utilities.

``TorchLinear``-style initialization: the reference relies on PyTorch's
default ``nn.Linear`` init (kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
for weights, U(+-1/sqrt(fan_in)) for bias) and ``nn.Embedding`` init N(0, 1).
Training dynamics of these small MLPs are sensitive to the init scale, so we
reproduce it rather than using flax defaults.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(+-1/sqrt(fan_in)); flax kernels are (fan_in, fan_out)."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """nn.Dense with torch-default init and optional compute dtype.

    Parameters are always stored in f32 ("master weights"); `dtype`
    (e.g. bfloat16) only selects the computation precision, halving HBM
    traffic and using the MXU's native bf16 path.
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
        )(x)


def mlp(x, widths, activate_final=False, dtype=None):
    """Plain ReLU MLP over the last axis."""
    for i, w in enumerate(widths):
        x = Dense(w, dtype=dtype)(x)
        if i < len(widths) - 1 or activate_final:
            x = jax.nn.relu(x)
    return x
