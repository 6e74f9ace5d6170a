"""Stage a clip-shaped synthetic SISAP dataset for the offline
full-dress rehearsal of the real-data path.

Writes ``<data-dir>/<kind>/<size>/dataset.h5`` + ``query.h5`` with the
SISAP schema (`KIND_TO_KEY`, e.g. clip768v2 → key "emb") so the exact
advertised command — ``python bench.py --dataset clip768v2 --size
10M`` — runs end-to-end on this box: host HDF5 → normalize →
build_packed_int8 → build → search → result HDF5 → recall.  The
vectors are seeded clustered unit-norm blobs (CLIP-like structure);
recall on them is NOT comparable to LAION, which is exactly why the
rehearsal exists: it proves the I/O + memory path, the one file-drop
claim, not the quality number.

Usage: python tools/stage_synthetic_dataset.py [n] [kind] [size] [d]
"""
import os
import sys
import time

import h5py
import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from learnedmetricindex_tpu.data import KIND_TO_KEY  # noqa: E402

N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
KIND = sys.argv[2] if len(sys.argv) > 2 else "clip768v2"
SIZE = sys.argv[3] if len(sys.argv) > 3 else "10M"
D = int(sys.argv[4]) if len(sys.argv) > 4 else 768
Q = 10_000
CLUSTERS = 256
NOISE = 0.45
BLOCK = 500_000

key = KIND_TO_KEY.get(KIND, KIND)
out_dir = os.path.join("data", KIND, SIZE)
os.makedirs(out_dir, exist_ok=True)

rng = np.random.default_rng(2023)
centers = rng.normal(size=(CLUSTERS, D)).astype(np.float32)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
# per-dimension noise scale: a raw N(0, NOISE^2) perturbation in D
# dims has norm NOISE*sqrt(D) (~12.5 at D=768), which drowns the
# unit-norm centers and makes the data isotropic — unlearnable by
# construction.  Dividing by sqrt(D) gives noise-vector norm ≈ NOISE
# relative to the unit centers, matching bench.py's RowGenerator
# (the first staged rehearsal ran WITHOUT this scaling; its recall
# floor was the isotropic regime, not a pipeline fault — the
# oracle-navigation ceiling in the artifact shows the same collapse)
NOISE_PER_DIM = NOISE / np.sqrt(D)

t0 = time.time()
with h5py.File(os.path.join(out_dir, "dataset.h5"), "w") as f:
    ds = f.create_dataset(key, shape=(N, D), dtype=np.float32,
                          chunks=(min(BLOCK, N), D))
    for s in range(0, N, BLOCK):
        e = min(s + BLOCK, N)
        c = rng.integers(0, CLUSTERS, e - s)
        x = centers[c] + rng.normal(size=(e - s, D)).astype(
            np.float32
        ) * NOISE_PER_DIM
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        ds[s:e] = x
        print(f"  dataset rows {e}/{N} ({time.time()-t0:.0f}s)",
              flush=True)

with h5py.File(os.path.join(out_dir, "query.h5"), "w") as f:
    c = rng.integers(0, CLUSTERS, Q)
    x = centers[c] + rng.normal(
        size=(Q, D)
    ).astype(np.float32) * NOISE_PER_DIM
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    f.create_dataset(key, data=x)

sz = sum(
    os.path.getsize(os.path.join(out_dir, p))
    for p in ("dataset.h5", "query.h5")
)
print(f"staged {out_dir}: {sz/2**30:.1f} GiB in {time.time()-t0:.0f}s",
      flush=True)
