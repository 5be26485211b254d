"""ann-benchmarks HDF5 ingestion (reference S1/S2).

The reference loads ``train``/``test``/``distances``/``neighbors`` matrices
from ann-benchmarks HDF5 files and reshapes flat f32/i32 arrays by stride
(/root/reference/annbench/annbench.go:189-293).  Spark has no HDF5 source;
HDF5 is also a driver-unfriendly format at 100 TB (single-file, no
row-group parallelism), so the scale design is:

1. one driver-side (or per-file ``mapInPandas``) conversion pass
   HDF5 → Parquet using ``h5py`` when it is installed;
2. everything downstream reads the Parquet (columnar, splittable,
   predicate-pushdown-able) — the same tables FIXTURES.md synthesizes when
   no HDF5 files/library exist (this sandbox: ``h5py`` is absent, so the
   conversion path is import-gated and unit tests cover the wiring with a
   fake module).

``dataset_to_parquet`` mirrors PrepHdf5BenchDataset's outputs: a ``train``
table (vec_id, vec), a ``test`` table (vec_id, vec) and a ``ground_truth``
table (query_id, rank, neighbor_id, dist) from the published
neighbors/distances matrices.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def _require_h5py():
    try:
        import h5py  # type: ignore
    except ImportError as e:  # pragma: no cover - exercised via fake in tests
        raise NotImplementedError(
            "HDF5 ingestion needs the optional 'h5py' dependency (not "
            "installed in this environment). Convert the dataset to Parquet "
            "elsewhere or use the deterministic fixtures (FIXTURES.md); the "
            "rest of the pipeline is format-agnostic."
        ) from e
    return h5py


def read_matrix(h5file: Any, name: str) -> np.ndarray:
    """One named matrix as a 2-D numpy array (GetVectorsFromHDF5 analog,
    /root/reference/annbench/annbench.go:189-218 — h5py handles the stride
    reshape the Go code does by hand)."""
    ds = h5file[name]
    arr = np.asarray(ds)
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    return arr


def dataset_to_parquet(h5_path: str, out_dir: str, *, h5py_mod=None) -> dict:
    """HDF5 ann-benchmarks file → Parquet tables under ``out_dir``.

    Returns {"train": path, "test": path, "ground_truth": path}.
    ``h5py_mod`` is injectable for tests (the sandbox has no h5py).
    """
    import pandas as pd

    h5py = h5py_mod or _require_h5py()
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    with h5py.File(h5_path, "r") as f:
        for name in ("train", "test"):
            mat = read_matrix(f, name).astype(np.float64)
            df = pd.DataFrame({
                "vec_id": np.arange(mat.shape[0], dtype=np.int64),
                "vec": list(mat),
            })
            paths[name] = os.path.join(out_dir, f"{name}.parquet")
            df.to_parquet(paths[name], index=False)
        # ground truth: neighbors[q, r] + distances[q, r] → long format,
        # rank is 1-based like our top-k operator
        neigh = read_matrix(f, "neighbors").astype(np.int64)
        dist = read_matrix(f, "distances").astype(np.float64)
        nq, k = neigh.shape
        gt = pd.DataFrame({
            "query_id": np.repeat(np.arange(nq, dtype=np.int64), k),
            "rank": np.tile(np.arange(1, k + 1, dtype=np.int64), nq),
            "neighbor_id": neigh.reshape(-1),
            "dist": dist.reshape(-1),
        })
        paths["ground_truth"] = os.path.join(out_dir, "ground_truth.parquet")
        gt.to_parquet(paths["ground_truth"], index=False)
    return paths
