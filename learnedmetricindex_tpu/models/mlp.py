"""MLP classifiers as pure parameter pytrees.

Re-implements the capability of the reference's nine registered MLP
architectures (``search/li/model.py:29-79``: hidden widths 8–512, one
or two ReLU hidden layers) as functional JAX models:

* parameters are plain pytrees ``[{"w": (in, out), "b": (out,)}, ...]``,
  so a *collection* of same-shape node models stacks into one pytree
  with a leading model axis and trains/infers under ``vmap`` — the key
  structural difference from the reference, which keeps one
  ``torch.nn.Sequential`` per node and loops over them in Python
  (``LearnedIndexBuilder.py:240-278``, ``LearnedIndex.py:269-281``);
* initialization mirrors ``torch.nn.Linear``'s default
  (``U(-1/√fan_in, 1/√fan_in)`` for both weight and bias) so training
  dynamics stay comparable to the published configuration.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

#: model type → hidden-layer widths (cf. ``supported_models``,
#: ``search/li/model.py:29-79``).
MLP_REGISTRY: Dict[str, List[int]] = {
    "MLP": [128],
    "MLP-2": [64],
    "MLP-3": [256],
    "MLP-4": [512],
    "MLP-5": [256, 128],
    "MLP-6": [32],
    "MLP-7": [16],
    "MLP-8": [8],
    "MLP-9": [8, 16],
}

Params = List[Dict[str, jnp.ndarray]]


def layer_dims(model_type: str, input_dim: int, output_dim: int) -> List[int]:
    if model_type not in MLP_REGISTRY:
        raise ValueError(
            f"Model type {model_type} not supported."
        )  # cf. model.py:82-85
    return [input_dim, *MLP_REGISTRY[model_type], output_dim]


def init_mlp(
    key: jax.Array, model_type: str, input_dim: int, output_dim: int
) -> Params:
    """Initialize one MLP (torch.nn.Linear-style uniform init)."""
    dims = layer_dims(model_type, input_dim, output_dim)
    params: Params = []
    for fan_in, fan_out in zip(dims[:-1], dims[1:]):
        key, wkey, bkey = jax.random.split(key, 3)
        bound = 1.0 / (fan_in**0.5)
        params.append(
            {
                "w": jax.random.uniform(
                    wkey, (fan_in, fan_out), jnp.float32, -bound, bound
                ),
                "b": jax.random.uniform(
                    bkey, (fan_out,), jnp.float32, -bound, bound
                ),
            }
        )
    return params


def init_stacked_mlp(
    key: jax.Array,
    n_models: int,
    model_type: str,
    input_dim: int,
    output_dim: int,
) -> Params:
    """Initialize ``n_models`` independent MLPs stacked on a leading axis."""
    keys = jax.random.split(key, n_models)
    return jax.vmap(
        lambda k: init_mlp(k, model_type, input_dim, output_dim)
    )(keys)


def mlp_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass → logits.  ``x``: (..., input_dim)."""
    h = x
    for i, layer in enumerate(params):
        h = jnp.dot(h, layer["w"], preferred_element_type=jnp.float32) + layer["b"]
        if i < len(params) - 1:
            h = jax.nn.relu(h)
    return h


def stacked_mlp_apply(stacked: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Forward all stacked models on the SAME inputs.

    ``x``: (batch, d) → logits (n_models, batch, out).  One einsum per
    layer; this is how query navigation evaluates every same-level node
    model at once instead of the reference's per-path loop
    (``LearnedIndex.py:269-281``).
    """
    h = None
    for i, layer in enumerate(stacked):
        if h is None:
            h = (
                jnp.einsum(
                    "qd,mdk->mqk", x, layer["w"],
                    preferred_element_type=jnp.float32,
                )
                + layer["b"][:, None, :]
            )
        else:
            h = (
                jnp.einsum(
                    "mqd,mdk->mqk", h, layer["w"],
                    preferred_element_type=jnp.float32,
                )
                + layer["b"][:, None, :]
            )
        if i < len(stacked) - 1:
            h = jax.nn.relu(h)
    return h


def stacked_mlp_apply_per_model(stacked: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Forward each stacked model on ITS OWN batch.

    ``x``: (n_models, batch, d) → logits (n_models, batch, out); used by
    the concurrent per-node trainer.
    """
    return jax.vmap(mlp_apply)(stacked, x)


def n_output_classes(params: Params) -> int:
    return params[-1]["b"].shape[-1]
