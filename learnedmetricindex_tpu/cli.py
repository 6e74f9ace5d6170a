"""Experiment driver CLI.

Mirrors the reference driver's flag surface and flow
(``search/search.py:306-349`` argparse → ``run`` → build → bucket sweep
→ result HDF5), with the documented quirks fixed (SURVEY.md §7):

* ``-b/--n-buckets`` actually works (the reference parses it but never
  passes it to ``run``, ``search/search.py:335-349``) — when given it
  overrides the ``--buckets-perc`` sweep with explicit bucket counts;
* ``--preprocess``/``--save`` are real booleans
  (``--no-preprocess``/``--no-save``), not ``type=bool`` string traps
  (``search/search.py:320-321``);
* ``--synthetic N`` runs fully offline on seeded clustered blobs (the
  reference always downloads SISAP data, ``search/search.py:38-48``).

Run as ``python -m learnedmetricindex_tpu.cli [flags]``.
"""

from __future__ import annotations

import argparse
import logging
import os
import time
from typing import List

import numpy as np

from learnedmetricindex_tpu.config import SUPPORTED_CLUSTERINGS
from learnedmetricindex_tpu.utils.logging import configure_logging

LOG = logging.getLogger("learnedmetricindex_tpu.cli")

MODELS_DIR_NAME = "models"  # cf. search/search.py:28


def format_identifier(
    bucket: int, kind: str, config, clustering_algorithms: List[str],
    short_identifier: str, size: str,
) -> str:
    """Cf. ``search/search.py:66-85`` (minus the PBS_JOBID injection;
    a JOB_ID env var is honored when present)."""
    job = os.environ.get("PBS_JOBID", os.environ.get("JOB_ID", "local"))

    def ser(lst):
        return ",".join(map(str, lst))  # cf. utils.py:56-58

    return (
        f"{short_identifier}-{kind}-{size}"
        f"-ep={ser(config.epochs)}"
        f"-lr={ser(config.lrs)}"
        f"-cat={ser(config.n_categories)}"
        f"-model={ser(config.model_types)}"
        f"-buck={bucket}"
        f"-clustering_algorithm={ser(clustering_algorithms)}"
        f"-{job}"
    )


def run(
    kind: str,
    key: str,
    size: str,
    k: int,
    index_type: str,
    n_buckets_perc: List[int],
    n_categories: List[int],
    epochs: List[int],
    model_types: List[str],
    lr: List[float],
    preprocess: bool,
    save: bool,
    clustering_algorithms: List[str],
    n_buckets_explicit=None,
    synthetic: int = 0,
    synthetic_dim: int = 96,
    policy: str = "best_first",
    nav_temp=None,
    seed: int = 2023,
    chunk_size: int = 1024,
    dtype: str = "float32",
    batch_size: int = 256,
    out_dir: str = "result",
    shard_devices: int = 0,
    download: bool = True,
    data_dir: str = "data",
):
    """Cf. reference ``run`` (``search/search.py:108-170``)."""
    import learnedmetricindex_tpu as lmi
    from learnedmetricindex_tpu import eval as lmi_eval
    from learnedmetricindex_tpu.data import (
        load_dataset,
        normalize,
        synthetic_blobs,
    )

    assert index_type in {"baseline", "learned-index"}, (
        f"Unknown index type: {index_type}"
    )  # cf. search.py:123-126

    if synthetic:
        data, queries = synthetic_blobs(
            synthetic, synthetic_dim, max(synthetic // 100, 100), seed=seed
        )
        kind = f"synthetic{synthetic_dim}"
    else:
        data, queries = load_dataset(
            kind, size, data_dir, key=key, preprocess=False,
            download=download,
        )
        if preprocess:
            data, queries = normalize(data), normalize(queries)

    n, d = data.shape
    LOG.info("Loaded data: n=%d, d=%d; queries=%s", n, d, queries.shape)

    if index_type == "baseline":
        baseline = lmi.Baseline()
        build_t = baseline.build(data)
        LOG.info("Build time: %s", build_t)
        dists, nns, search_t = baseline.search(queries=queries, data=data, k=k)
        LOG.info("Search time: %s", search_t)
        return dists, nns

    # ---- learned index (cf. evaluate_learned_index, search.py:173-283)
    s = time.perf_counter()
    data_search, queries_search = data, queries
    kind_search = kind
    if not synthetic and kind != "clip768v2":
        # dual-embedding: navigate in `kind`, scan in clip768v2
        # (cf. search.py:192-215)
        kind_search = "clip768v2"
        data_search, queries_search = load_dataset(
            kind_search, size, data_dir, key="emb", preprocess=preprocess,
            download=download,
        )

    config = lmi.BuildConfiguration(
        clustering_algorithms,
        epochs,
        model_types,
        lr,
        n_categories,
        seed=seed,
        batch_size=batch_size,
        chunk_size=chunk_size,
        dtype=dtype,
    )
    mesh = None
    if shard_devices:
        from learnedmetricindex_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(shard_devices if shard_devices > 0 else None)
        LOG.info(
            "Sharding over mesh %s", dict(zip(mesh.axis_names, mesh.devices.shape))
        )
    builder = lmi.LearnedIndexBuilder(data, config, mesh=mesh)
    index, data_prediction, n_buckets_in_index, build_t, cluster_t = builder.build()
    LOG.info("Total number of buckets in the index: %d", n_buckets_in_index)
    LOG.info("Cluster time: %.2f", cluster_t)
    LOG.info("Pure build time: %.2f", build_t)
    LOG.info("Overall build time: %.2f", time.perf_counter() - s)

    if save:
        os.makedirs(MODELS_DIR_NAME, exist_ok=True)
        save_path = os.path.join(
            MODELS_DIR_NAME,
            format_identifier(
                0, kind, config, clustering_algorithms, "index", size
            )
            + ".npz",
        )
        LOG.info("Saving index to %s", save_path)
        index.save(save_path, data_prediction)

    if n_buckets_explicit:
        n_buckets = sorted(set(b for b in n_buckets_explicit if b > 0))
    else:
        n_buckets = [
            int((p / 100) * n_buckets_in_index) for p in n_buckets_perc
        ]
        n_buckets = sorted(set(b for b in n_buckets if b > 0))
    LOG.info("Number of buckets to search in: %s", n_buckets)

    shared_store = None
    if mesh is not None:
        shared_store = index.get_sharded_store(
            data_search, data_prediction, mesh
        )
    results = []
    for bucket in n_buckets:
        LOG.info("Searching with %d buckets", bucket)
        dists, nns, measured = index.search(
            data_navigation=data,
            queries_navigation=queries,
            data_search=data_search,
            queries_search=queries_search,
            data_prediction=data_prediction,
            n_categories=n_categories,
            n_buckets=bucket,
            k=k,
            policy=policy,
            nav_temp=nav_temp,
            store=shared_store,
        )
        for key_t in ("inference", "search", "search_within_buckets",
                      "seq_search", "sort"):
            LOG.info("%s time: %.4f", key_t, measured[key_t])

        short_identifier = "learned-index"
        identifier = format_identifier(
            bucket, kind, config, clustering_algorithms, short_identifier, size
        )
        dst = os.path.join(out_dir, kind, size, f"{identifier}.h5")
        lmi_eval.store_results(
            dst,
            short_identifier.capitalize(),
            kind,
            dists,
            nns,
            build_t,
            measured["search"],
            identifier,
            size,
        )
        results.append(dst)
    return results


def build_parser() -> argparse.ArgumentParser:
    """Flag surface parity with ``search/search.py:306-327``."""
    parser = argparse.ArgumentParser(
        prog="learnedmetricindex_tpu",
        description="TPU-native Learned Metric Index experiment driver",
    )
    parser.add_argument("--dataset", default="pca96v2")
    parser.add_argument("--emb", default="pca96")
    parser.add_argument(
        "--size", default="100K", choices=["100K", "300K", "10M", "30M", "100M"]
    )
    parser.add_argument("--k", default=10, type=int)
    parser.add_argument("--n-categories", nargs="+", default=[10, 10], type=int)
    parser.add_argument("--epochs", nargs="+", default=[100], type=int)
    parser.add_argument("--model-type", nargs="+", default=["MLP"])
    parser.add_argument("--lr", nargs="+", default=[0.01], type=float)
    parser.add_argument("-b", "--n-buckets", nargs="+", default=None, type=int)
    parser.add_argument("-bp", "--buckets-perc", nargs="+", default=[10], type=int)
    parser.add_argument(
        "--preprocess", action=argparse.BooleanOptionalAction, default=True
    )
    parser.add_argument(
        "--save", action=argparse.BooleanOptionalAction, default=True
    )
    parser.add_argument(
        "--clustering-algorithm",
        nargs="+",
        default=["kmeans"],
        choices=list(SUPPORTED_CLUSTERINGS),
    )
    parser.add_argument(
        "--index-type", default="learned-index",
        choices=["baseline", "learned-index"],
    )
    # TPU-framework additions
    parser.add_argument("--synthetic", type=int, default=0, metavar="N",
                        help="run offline on N synthetic clustered vectors")
    parser.add_argument("--synthetic-dim", type=int, default=96)
    parser.add_argument("--nav-temp", default=None,
                        help="navigation softmax temperature: scalar or "
                             "per-level comma list (e.g. '1,4'); "
                             "counteracts per-level overconfidence in "
                             "multi-level joint ranking")
    parser.add_argument("--policy", default="best_first",
                        choices=["best_first", "joint"])
    parser.add_argument("--seed", type=int, default=2023)
    parser.add_argument("--chunk-size", type=int, default=1024)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--out-dir", default="result")
    parser.add_argument(
        "--shard-devices", type=int, default=0, metavar="N",
        help="shard build and search over an N-device mesh "
        "(-1 = all devices; 0 = single-device, the default)",
    )
    parser.add_argument("--data-dir", default="data",
                        help="where SISAP HDF5 files live (or are staged)")
    parser.add_argument(
        "--download", action=argparse.BooleanOptionalAction, default=True,
        help="--no-download = strictly offline: use pre-staged SISAP "
        "files only and fail with the expected path instead of "
        "attempting a download",
    )
    return parser


def expand_per_level(args: dict) -> None:
    """Cf. ``validate_and_expand_per_level_arguments``
    (``search/search.py:292-303``)."""
    n = len(args["n_categories"])
    for arg in ("clustering_algorithm", "model_type", "epochs", "lr"):
        if len(args[arg]) == 1:
            args[arg] = args[arg] * n
        else:
            assert len(args[arg]) == n, (
                f"--{arg.replace('_', '-')} must have 1 or {n} values"
            )


def main(argv=None):
    configure_logging()
    from learnedmetricindex_tpu import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    expand_per_level(vars(args))
    return run(
        args.dataset,
        args.emb,
        args.size,
        args.k,
        args.index_type,
        args.buckets_perc,
        args.n_categories,
        args.epochs,
        args.model_type,
        args.lr,
        args.preprocess,
        args.save,
        args.clustering_algorithm,
        n_buckets_explicit=args.n_buckets,
        synthetic=args.synthetic,
        synthetic_dim=args.synthetic_dim,
        policy=args.policy,
        nav_temp=(None if args.nav_temp is None else
                  (lambda ts: ts[0] if len(ts) == 1 else ts)(
                      [float(t) for t in str(args.nav_temp).split(",")])),
        seed=args.seed,
        download=args.download,
        data_dir=args.data_dir,
        chunk_size=args.chunk_size,
        dtype=args.dtype,
        batch_size=args.batch_size,
        out_dir=args.out_dir,
        shard_devices=args.shard_devices,
    )


if __name__ == "__main__":
    main()
