"""NeRF positional encoding.

Behavioral reference: `model/dimension_kernel.py:5-75` (Embedder /
Trigonometric_kernel): log-spaced frequencies 2^0..2^(L-1), features ordered
[x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...]. The ordering is kept so
reference-trained weights could be ported layer-for-layer.

One fused jnp expression — XLA folds it into the adjacent matmul's prologue.
"""

from __future__ import annotations

import jax.numpy as jnp


def posenc_dim(input_dim: int, n_freqs: int, include_input: bool = True) -> int:
    return input_dim * (int(include_input) + 2 * n_freqs)


def gaussian_fourier_features(
    x: jnp.ndarray, b_matrix: jnp.ndarray
) -> jnp.ndarray:
    """Random Fourier-feature mapping [sin(xB^T), cos(xB^T)].

    Equivalent of the reference's (instantiable but unused) `Gaussian_Kernel`
    (`model/dimension_kernel.py:95-114`). b_matrix: (dim_embed, dim_in),
    typically N(0, ffm_scale^2); returns (..., 2*dim_embed).
    """
    y = x @ b_matrix.T
    return jnp.concatenate([jnp.sin(y), jnp.cos(y)], axis=-1)


def posenc(x: jnp.ndarray, n_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """x: (..., D) -> (..., D * (include_input + 2*n_freqs))."""
    if n_freqs == 0:
        return x if include_input else x[..., :0]
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)          # (L,)
    xb = x[..., None, :] * freqs[:, None]                      # (..., L, D)
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # interleave per-frequency [sin, cos] to match the reference layout
    sc = jnp.stack([sin, cos], axis=-2)                        # (..., L, 2, D)
    sc = sc.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
    if include_input:
        return jnp.concatenate([x, sc], axis=-1)
    return sc
