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


def _savez(path: str, arrays: dict) -> None:
    """``np.savez_compressed`` appends ``.npz`` to bare paths, which
    would make ``save(path)`` / ``load(path)`` disagree on the file
    name — write through an open handle so the caller's exact path is
    the file that exists."""
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


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
    _savez(path, arrays)


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


# ----------------------------------------------------------------------
# mutable-deployment checkpoints (index + packed store + id allocator)
# ----------------------------------------------------------------------
def save_dynamic_index(dyn, path: str) -> None:
    """Checkpoint a :class:`~learnedmetricindex_tpu.index.mutation.
    DynamicIndex` — the vectors live in the store (possibly inserted at
    serve time, so no original corpus file could reconstruct them), so
    the store's packed arrays are saved alongside the index.  bf16
    stores round-trip losslessly through f32 (numpy has no bf16)."""
    import jax.numpy as jnp

    st = dyn.store
    store_dtype = str(jnp.dtype(st.chunk_data.dtype))
    chunk_data = np.asarray(
        st.chunk_data.astype(jnp.float32)
        if st.chunk_data.dtype == jnp.bfloat16
        else st.chunk_data
    )
    arrays = {
        "__meta__": np.frombuffer(
            json.dumps(
                {
                    "format_version": FORMAT_VERSION,
                    "kind": "dynamic",
                    "config": dyn.index.config.to_dict(),
                    "n_levels": dyn.index.n_levels,
                    "model_types": [
                        lv.model_type for lv in dyn.index.levels
                    ],
                    "n_layers": [len(lv.params) for lv in dyn.index.levels],
                    "store_dtype": store_dtype,
                    "chunk": st.chunk,
                    "n_buckets": st.n_buckets,
                    "next_id": dyn.next_id,
                }
            ).encode(),
            dtype=np.uint8,
        ),
        "leaf_valid": dyn.index.leaf_valid,
        "store_chunk_data": chunk_data,
        "store_chunk_ids": np.asarray(st.chunk_ids),
        "store_bucket_chunk_start": st.bucket_chunk_start,
        "store_bucket_sizes": st.bucket_sizes,
        "store_row_slot": np.asarray(st.row_slot),
        "store_bucket_chunk_ptr": st.bucket_chunk_ptr,
        "store_bucket_chunk_list": st.bucket_chunk_list,
        "store_bucket_fill": st.bucket_fill,
    }
    if st.chunk_scales is not None:
        arrays["store_chunk_scales"] = np.asarray(st.chunk_scales)
    for li, level in enumerate(dyn.index.levels):
        arrays[f"level{li}_class_mask"] = np.asarray(level.class_mask)
        for lj, layer in enumerate(level.params):
            arrays[f"level{li}_layer{lj}_w"] = np.asarray(layer["w"])
            arrays[f"level{li}_layer{lj}_b"] = np.asarray(layer["b"])
    _savez(path, arrays)


def load_dynamic_index(path: str):
    """Restore a mutable deployment checkpoint: returns a
    :class:`DynamicIndex` ready to ``search`` / ``insert`` / ``delete``
    (results identical to the instance that was saved)."""
    import jax.numpy as jnp

    from learnedmetricindex_tpu.index.bucket_store import BucketStore
    from learnedmetricindex_tpu.index.mutation import DynamicIndex

    index, _ = load_index(path)
    with np.load(path, allow_pickle=False) as f:
        meta = json.loads(bytes(f["__meta__"].tobytes()).decode())
        if meta.get("kind") != "dynamic":
            raise ValueError(
                f"{path} is a plain index checkpoint (save_index) — "
                "load it with load_index, or re-save the deployment "
                "with save_dynamic_index"
            )
        dtype = jnp.dtype(meta["store_dtype"])
        store = BucketStore(
            chunk_data=jnp.asarray(f["store_chunk_data"], dtype=dtype),
            chunk_ids=jnp.asarray(f["store_chunk_ids"]),
            bucket_chunk_start=f["store_bucket_chunk_start"],
            bucket_sizes=f["store_bucket_sizes"],
            chunk=meta["chunk"],
            n_buckets=meta["n_buckets"],
            chunk_scales=(
                jnp.asarray(f["store_chunk_scales"])
                if "store_chunk_scales" in f
                else None
            ),
            row_slot=jnp.asarray(f["store_row_slot"]),
            bucket_chunk_ptr=f["store_bucket_chunk_ptr"],
            bucket_chunk_list=f["store_bucket_chunk_list"],
            bucket_fill=f["store_bucket_fill"],
        )
        next_id = meta["next_id"]
    return DynamicIndex(index, store, next_id=next_id)
