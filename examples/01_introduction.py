#!/usr/bin/env python
"""Introduction: the Learned Metric Index API tour.

The executable counterpart of the reference's ``01-Introduction.ipynb``:
build a 2-level learned index ([10, 10] categories), search with an
increasing bucket budget, and watch recall approach exact search.  Runs
fully offline on seeded synthetic embeddings by default; pass ``--sisap``
to use the real SISAP'23 LAION data like the notebook (downloads ~300 MB:
pca32v2 for navigation and clip768v2 for the scan —
cf. notebook cells 5, 19-20 and ``search/search.py:192-215``).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sisap", action="store_true",
                        help="use real SISAP LAION-100K data (downloads)")
    parser.add_argument("--n", type=int, default=100_000)
    args = parser.parse_args()

    import learnedmetricindex_tpu as lmi
    from learnedmetricindex_tpu.data import load_dataset, synthetic_blobs
    from learnedmetricindex_tpu.ops import exact_knn, recall

    lmi.enable_compilation_cache()  # re-runs skip the multi-minute compiles

    # ------------------------------------------------------------------
    # 1. Data: navigation embeddings + (possibly different) search
    #    embeddings.  The notebook navigates in 32-d PCA space and scans
    #    in 768-d CLIP space; synthetic mode uses one space for both.
    # ------------------------------------------------------------------
    if args.sisap:
        data_nav, queries_nav = load_dataset("pca32v2", "100K")
        data_search, queries_search = load_dataset("clip768v2", "100K")
    else:
        data_nav, queries_nav = synthetic_blobs(
            args.n, 32, 1_000, n_clusters=64, seed=2023
        )
        data_search, queries_search = data_nav, queries_nav

    print(f"data: {data_nav.shape} navigation, {data_search.shape} search")

    # ------------------------------------------------------------------
    # 2. Ground truth (exact brute force) for recall measurement
    #    (cf. notebook cell 30-31).
    # ------------------------------------------------------------------
    _, gt = exact_knn(data_search, queries_search, k=10)

    # ------------------------------------------------------------------
    # 3. Build a 2-level index: 10 level-1 nodes x 10 leaf buckets each
    #    (the notebook configuration: cells 14, 22).
    # ------------------------------------------------------------------
    config = lmi.BuildConfiguration(
        clustering_algorithms="kmeans",
        epochs=100,
        model_types="MLP",
        lrs=0.01,
        n_categories=[10, 10],
        seed=2023,
    )
    start = time.perf_counter()
    builder = lmi.LearnedIndexBuilder(data_nav, config)
    index, data_prediction, n_buckets, build_s, cluster_s = builder.build()
    print(f"built {n_buckets} buckets in {time.perf_counter() - start:.1f}s "
          f"(clustering {cluster_s:.1f}s)")

    # ------------------------------------------------------------------
    # 4. Search with an increasing bucket budget: recall climbs toward
    #    1.0 while touching only a fraction of the data.
    # ------------------------------------------------------------------
    for n_visit in (1, 2, 5, 10, 20):
        dists, nns, measured = index.search(
            data_navigation=data_nav,
            queries_navigation=queries_nav,
            data_search=data_search,
            queries_search=queries_search,
            data_prediction=data_prediction,
            n_categories=config.n_categories,
            n_buckets=n_visit,
            k=10,
        )
        r = recall(nns, gt, 10)
        frac = n_visit / n_buckets
        print(f"  {n_visit:3d}/{n_buckets} buckets (~{frac:5.1%} of data): "
              f"recall@10 = {r:.4f}, "
              f"search = {measured['search']:.3f}s "
              f"(navigation {measured['inference']:.3f}s)")

    # ------------------------------------------------------------------
    # 5. Persist and reload (the reference pickles models but cannot
    #    reload them for search; here the round-trip works).
    # ------------------------------------------------------------------
    index.save("/tmp/lmi-intro-index.npz", data_prediction)
    index2, pred2 = lmi.LearnedIndex.load("/tmp/lmi-intro-index.npz")
    _, nns2, _ = index2.search(
        data_nav, queries_nav, data_search, queries_search, pred2,
        config.n_categories, n_buckets=10, k=10,
    )
    print(f"reloaded index recall@10: {recall(nns2, gt, 10):.4f}")


if __name__ == "__main__":
    main()
