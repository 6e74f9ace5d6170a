"""Row-scaled int8 quantization for the vector store.

Symmetric per-row int8: ``q = round(x / scale)``, ``scale = max|x| / 127``
per row.  For unit-norm embeddings the dot-product error is ~4e-4 —
an order of magnitude tighter than bf16 storage — while halving HBM
bytes versus bf16 (and enabling a fully *packed* bucket store plus the
original corpus to coexist at 10M×768 scale on one chip).

No reference counterpart (faiss scalar quantizers exist upstream but the
reference never uses them); this is a TPU-memory-motivated extension.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# the ONE definition of the symmetric per-row int8 scheme — the jax
# path, the host packing path (bucket_store), and the host bench path
# must agree bit-for-bit or stores desynchronize from oracles
EPS = 1e-12
QMAX = 127


def row_scales_np(x: np.ndarray) -> np.ndarray:
    """(n, d) host floats → (n,) f32 per-row scales."""
    x = np.asarray(x, np.float32)
    return (np.maximum(np.abs(x).max(axis=1), EPS) / QMAX).astype(np.float32)


def quantize_with_scales_np(x: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """(n, d) host floats + (n,) scales → (n, d) int8 (same rounding /
    clipping as the jitted :func:`quantize_rows`)."""
    x = np.asarray(x, np.float32)
    return np.clip(
        np.round(x / scales[:, None]), -QMAX, QMAX
    ).astype(np.int8)


def quantize_rows_np(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side :func:`quantize_rows`: (n, d) → (int8, (n,) scales)."""
    scales = row_scales_np(x)
    return quantize_with_scales_np(x, scales), scales


@jax.jit
def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(n, d) floats → (int8 values, per-row f32 scales)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, EPS) / QMAX
    q = jnp.clip(jnp.round(xf / scale), -QMAX, QMAX).astype(jnp.int8)
    return q, scale[..., 0]


@jax.jit
def dequantize_rows(q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """(…, d) int8 + (…,) scales → f32."""
    return q.astype(jnp.float32) * scales[..., None]
