"""Index save / load.

The reference pickles the whole ``LearnedIndex`` (torch models +
bucket paths) to ``models/<name>.pkl`` (``search/search.py:234-241``,
``search/li/utils.py:14-29``) but (a) ships no load path and (b) omits
``data_prediction`` — the object→bucket map ``search`` requires — so a
reloaded index is unusable (SURVEY.md §5, checkpoint/resume).

Here an index round-trips through one ``.npz`` file: stacked model
parameters per level, class masks, leaf validity, the build
configuration (JSON), and — fixing the reference gap —
``data_prediction``.  ``load_index`` returns an index ready to
``search`` against the original data.
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np

from learnedmetricindex_tpu.config import BuildConfiguration
from learnedmetricindex_tpu.index.index import LearnedIndex, LevelModels
from learnedmetricindex_tpu.index.navigation import TreeLayout

FORMAT_VERSION = 1


def save_index(
    index: LearnedIndex,
    path: str,
    data_prediction: Optional[np.ndarray] = None,
) -> None:
    arrays = {
        "__meta__": np.frombuffer(
            json.dumps(
                {
                    "format_version": FORMAT_VERSION,
                    "config": index.config.to_dict(),
                    "n_levels": index.n_levels,
                    "model_types": [lv.model_type for lv in index.levels],
                    "n_layers": [len(lv.params) for lv in index.levels],
                }
            ).encode(),
            dtype=np.uint8,
        ),
        "leaf_valid": index.leaf_valid,
    }
    if data_prediction is not None:
        arrays["data_prediction"] = np.asarray(data_prediction)
    for li, level in enumerate(index.levels):
        arrays[f"level{li}_class_mask"] = np.asarray(level.class_mask)
        for lj, layer in enumerate(level.params):
            arrays[f"level{li}_layer{lj}_w"] = np.asarray(layer["w"])
            arrays[f"level{li}_layer{lj}_b"] = np.asarray(layer["b"])
    np.savez_compressed(path, **arrays)


def load_index(path: str) -> Tuple[LearnedIndex, Optional[np.ndarray]]:
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as f:
        meta = json.loads(bytes(f["__meta__"].tobytes()).decode())
        assert meta["format_version"] == FORMAT_VERSION
        config = BuildConfiguration.from_dict(meta["config"])
        levels = []
        for li in range(meta["n_levels"]):
            params = [
                {
                    "w": jnp.asarray(f[f"level{li}_layer{lj}_w"]),
                    "b": jnp.asarray(f[f"level{li}_layer{lj}_b"]),
                }
                for lj in range(meta["n_layers"][li])
            ]
            levels.append(
                LevelModels(
                    params=params,
                    class_mask=f[f"level{li}_class_mask"],
                    model_type=meta["model_types"][li],
                )
            )
        leaf_valid = f["leaf_valid"]
        data_prediction = (
            np.asarray(f["data_prediction"]) if "data_prediction" in f else None
        )

    index = LearnedIndex(
        levels=levels,
        layout=TreeLayout.create(config.n_categories),
        config=config,
        leaf_valid=leaf_valid,
    )
    return index, data_prediction
