"""Reference-parity utility functions.

Device-backed equivalents of ``search/li/utils.py``: the cosine-distance
helper, list serializer, vectorized path matching, and pickle save.
Kept so code written against the reference's helper surface ports
directly.
"""

from __future__ import annotations

import pickle
from typing import Any, List, Tuple, Union

import numpy as np


def pairwise_cosine(x, y) -> np.ndarray:
    """Full cosine-distance matrix ``1 - cos(x_i, y_j)``
    (cf. ``utils.py:10-11``; computed as one device matmul on normalized
    rows instead of sklearn).  O(|x|·|y|) memory — intended for small
    inputs, like the reference baseline."""
    import jax
    import jax.numpy as jnp

    from learnedmetricindex_tpu.data import normalize

    xs = jnp.asarray(normalize(np.asarray(x)))
    ys = jnp.asarray(normalize(np.asarray(y)))
    sims = jnp.dot(
        xs, ys.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return np.asarray(1.0 - sims)


def save_as_pickle(filename: str, obj) -> None:
    """Cf. ``utils.py:14-29`` (prefer ``LearnedIndex.save`` — the npz
    format round-trips and is torch/pickle-free)."""
    with open(filename, "wb") as f:
        pickle.dump(obj, f)


def serialize(lst: List[Any]) -> str:
    """Comma-join a list for artifact filenames (cf. ``utils.py:56-58``)."""
    return ",".join(map(str, lst))


def filter_path_idxs(
    paths: np.ndarray, path: Union[Tuple, np.ndarray]
) -> np.ndarray:
    """Indexes of ``paths`` rows matching ``path``
    (cf. ``utils.py:61-65``)."""
    return np.where(np.all(np.asarray(paths) == np.asarray(path), axis=1))[0]
