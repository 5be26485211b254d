#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries on ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Scaling mode (``--scaling``): runs the identical pipeline job at local[8] and
local[32] in separate subprocesses on the same input and reports throughput at
both plus scaling efficiency ``(files_per_sec@32 / files_per_sec@8) / 4`` —
the sandbox stand-in for the N vs 4N executor-cluster criterion (BASELINE.md).
Writes BENCH_SCALING.md (BENCH.md is the hand-curated analysis).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_FILES = int(os.environ.get("SPARK_GRAFT_SYNTH_FILES", "10000"))


def _scratch_dir() -> str:
    """tmpfs when available: local-disk contention adds 2x run-to-run noise
    to stage write/read times and isn't representative of object-storage
    aggregate bandwidth anyway."""
    return "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def _make_ann_fixture(n: int, dims: int, path: str) -> None:
    """Deterministic gaussian-mixture embedding corpus (seeded numpy): one
    center per 100 points, cluster std 0.5×center scale — the same shape as
    the tests' mixture fixture, at benchmark size."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n_centers = max(n // 100, 1)
    centers = rng.normal(scale=10.0, size=(n_centers, dims))
    assign = rng.integers(0, n_centers, size=n)
    pts = centers[assign] + rng.normal(scale=0.5, size=(n, dims))
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "vec": list(pts.astype(np.float64))})
    tmp = path + ".tmp"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, path)


def _make_fmnist_shaped(out_dir: str) -> None:
    """Fashion-MNIST-*shaped* deterministic dataset at full ann-benchmarks
    scale (60k train / 1k test, 784 dims, L2), materialized through
    ``hdf5.dataset_to_parquet``'s fake-module path — the sandbox has no h5py
    and no real HDF5 datasets (r2 VERDICT task 2), so the geometry is
    synthesized: 10 pixel-space class centers (uniform [0,255]) + σ=40
    per-pixel noise, giving same-class NN distances ≈1580 and cross-class
    ≈3070 — brackets the reference's MaxDist=2200 the way real FMNIST does
    (/root/reference/annbench/annbench_test.go:140-150).  Ground truth =
    exact top-10 L2 in chunked numpy, published as the neighbors/distances
    matrices exactly like a real ann-benchmarks file."""
    _make_annbench_shaped(out_dir, n_proto=6_000, per_proto=10, n_test=1_000,
                          dims=784, sig_a=35.0, sig_b=10.0)


def _make_annbench_shaped(out_dir: str, n_proto: int, per_proto: int,
                          n_test: int, dims: int, sig_a: float, sig_b: float,
                          n_classes: int = 10, k: int = 10,
                          seed: int = 42) -> None:
    """Three-level geometry: class centers (uniform [0,255]^dims) →
    prototypes (σ_a per dim) → per-prototype variants (σ_b).  The prototype
    level is what real descriptor datasets have and a flat gaussian mixture
    lacks: genuine LOCAL neighbor structure (top-10 NN at ≈sqrt(2·dims)·σ_b,
    next-nearest cross-prototype ≈sqrt(2·dims·(σ_a²+σ_b²))) — in a flat
    mixture all same-class points are near-equidistant, hyperplanes split
    true neighbors independently, and no LSH (ours or the reference's) can
    reach its published recall.  Exact top-k ground truth in chunked numpy,
    published as neighbors/distances matrices like a real ann-benchmarks
    file."""
    import numpy as np

    from lsh_search_go_spark.sources import hdf5 as H5

    rng = np.random.default_rng(seed)
    n_train = n_proto * per_proto
    centers = rng.uniform(0.0, 255.0, size=(n_classes, dims))
    proto_cls = rng.integers(0, n_classes, n_proto)
    protos = np.clip(centers[proto_cls]
                     + rng.normal(0, sig_a, (n_proto, dims)), 0, 255)
    train = np.clip(np.repeat(protos, per_proto, 0)
                    + rng.normal(0, sig_b, (n_train, dims)),
                    0, 255).astype(np.float32)
    test = np.clip(protos[rng.permutation(n_proto)[:n_test]]
                   + rng.normal(0, sig_b, (n_test, dims)),
                   0, 255).astype(np.float32)

    tr64 = train.astype(np.float64)
    te64 = test.astype(np.float64)
    tr_sq = (tr64 * tr64).sum(1)
    neighbors = np.empty((n_test, k), np.int64)
    dists = np.empty((n_test, k))
    for lo in range(0, n_test, 100):
        q = te64[lo:lo + 100]
        d2 = (q * q).sum(1)[:, None] + tr_sq[None, :] - 2.0 * (q @ tr64.T)
        np.maximum(d2, 0, out=d2)
        idx = np.argpartition(d2, k, axis=1)[:, :k]
        dd = np.take_along_axis(d2, idx, 1)
        order = np.argsort(dd, axis=1, kind="stable")
        neighbors[lo:lo + 100] = np.take_along_axis(idx, order, 1)
        dists[lo:lo + 100] = np.sqrt(np.take_along_axis(dd, order, 1))

    mats = {"train": train, "test": test,
            "neighbors": neighbors.astype(np.int32),
            "distances": dists.astype(np.float32)}

    class _FakeFile(dict):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeH5:
        @staticmethod
        def File(path, mode):
            return _FakeFile(mats)

    H5.dataset_to_parquet("annbench_shaped.hdf5", out_dir, h5py_mod=_FakeH5)


def _make_nyt_shaped(out_dir: str, n_proto: int = 29_000, per_proto: int = 10,
                     n_test: int = 1_000, dims: int = 256,
                     n_classes: int = 20, k: int = 10, seed: int = 42) -> None:
    """NYTimes-bag-of-words-*shaped* dataset: 290k × 256, ANGULAR metric
    (/root/reference/README.md:168-172).  Same three-level geometry as the
    L2 sets but on direction space: unit class centers → protos at moderate
    angle (σ_a) → per-proto variants at small angle (σ_b).  The chosen σ's
    put same-proto neighbors at angular ≈0.37 and the NEAREST cross-proto
    siblings at ≈0.8 — right at the reference's MaxDist=0.81, reproducing
    the angular crowding that makes cosine its documented weak regime
    (README.md:166-167).  Ground truth = exact top-10 ANGULAR distance
    (sqrt(2·(1−cos)), lsh/helpers.go:240-246), chunked numpy."""
    import numpy as np

    from lsh_search_go_spark.sources import hdf5 as H5

    rng = np.random.default_rng(seed)
    n_train = n_proto * per_proto
    centers = rng.normal(size=(n_classes, dims))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    proto_cls = rng.integers(0, n_classes, n_proto)
    protos = centers[proto_cls] + rng.normal(0, 0.0625, (n_proto, dims))
    train = (np.repeat(protos, per_proto, 0)
             + rng.normal(0, 0.0236, (n_train, dims))).astype(np.float32)
    test = (protos[rng.permutation(n_proto)[:n_test]]
            + rng.normal(0, 0.0236, (n_test, dims))).astype(np.float32)

    tr64 = train.astype(np.float64)
    tr64 /= np.linalg.norm(tr64, axis=1, keepdims=True)
    te64 = test.astype(np.float64)
    te64 /= np.linalg.norm(te64, axis=1, keepdims=True)
    neighbors = np.empty((n_test, k), np.int64)
    dists = np.empty((n_test, k))
    for lo in range(0, n_test, 100):
        cos = te64[lo:lo + 100] @ tr64.T
        a2 = np.maximum(2.0 * (1.0 - cos), 0.0)       # angular² distance
        idx = np.argpartition(a2, k, axis=1)[:, :k]
        dd = np.take_along_axis(a2, idx, 1)
        order = np.argsort(dd, axis=1, kind="stable")
        neighbors[lo:lo + 100] = np.take_along_axis(idx, order, 1)
        dists[lo:lo + 100] = np.sqrt(np.take_along_axis(dd, order, 1))

    mats = {"train": train, "test": test,
            "neighbors": neighbors.astype(np.int32),
            "distances": dists.astype(np.float32)}

    class _FakeFile(dict):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeH5:
        @staticmethod
        def File(path, mode):
            return _FakeFile(mats)

    H5.dataset_to_parquet("nyt_shaped.hdf5", out_dir, h5py_mod=_FakeH5)


def _make_nyt_heavy(out_dir: str, n_proto: int = 29_000, per_proto: int = 10,
                    n_test: int = 1_000, dims: int = 256, vocab: int = 4096,
                    n_topics: int = 50, k: int = 10, seed: int = 42) -> None:
    """NYT-bag-of-words with the REAL dataset's construction and tails
    (r4 VERDICT task 8): the published nytimes-256-angular is PCA-projected
    TF vectors of count data, and count data is heavy-tailed — a gaussian
    direction mixture (the v1 generator) is kinder to hyperplane LSH than
    real text.  Here: Zipf word popularity → topic-boosted rates →
    per-prototype lognormal vocabulary jitter → lognormal doc lengths →
    Poisson counts per document → sqrt-TF → center → PCA(256) → unit norm,
    ANGULAR ground truth.  Measured geometry: same-prototype neighbors mean
    ≈0.66 angular with p90 ≈0.82, nearest cross-prototype p10 ≈0.75 — the
    reference's MaxDist=0.81 cuts through BOTH distributions, the crowding
    that makes cosine its documented weak regime (README.md:166-167), which
    the v1 fixture's clean 0.37/0.8 separation did not reproduce.
    Deterministic: seeded rng per stage + per chunk."""
    import numpy as np

    from lsh_search_go_spark.sources import hdf5 as H5

    rng = np.random.default_rng(seed)
    pop = 1.0 / np.arange(1, vocab + 1) ** 1.05        # Zipf popularity
    pop /= pop.sum()
    topic_rates = np.empty((n_topics, vocab))
    for t in range(n_topics):
        boost = np.ones(vocab)
        idx = rng.choice(vocab, 400, replace=False, p=pop)
        boost[idx] *= rng.lognormal(1.5, 1.0, size=400)
        r = pop * boost
        topic_rates[t] = r / r.sum()
    proto_topic = rng.integers(0, n_topics, n_proto)
    query_protos = rng.permutation(n_proto)[:n_test]
    is_query_proto = np.zeros(n_proto, dtype=bool)
    is_query_proto[query_protos] = True

    def proto_chunk(lo: int, hi: int):
        """(rates, lengths) for protos [lo, hi) — own seeded substream, so
        chunks are independent and the whole build is reproducible."""
        crng = np.random.default_rng(seed + 1000 + lo)
        jit = crng.lognormal(0.0, 1.2, size=(hi - lo, vocab))
        rates = topic_rates[proto_topic[lo:hi]] * jit
        rates /= rates.sum(1, keepdims=True)
        L = crng.lognormal(np.log(350), 0.5, size=hi - lo)
        return rates * L[:, None], crng

    def tf(counts: np.ndarray) -> np.ndarray:
        x = np.sqrt(counts, dtype=np.float64)           # sqrt-TF damping
        n = np.linalg.norm(x, axis=1, keepdims=True)
        return x / np.where(n > 0, n, 1.0)

    # PCA basis from a dedicated sample (first protos, one draw each)
    lam_s, srng = proto_chunk(0, min(5000, n_proto))
    sample = tf(srng.poisson(lam_s))
    mu = sample.mean(0)
    _, _, Vt = np.linalg.svd(sample - mu, full_matrices=False)
    P = np.ascontiguousarray(Vt[:dims].T)               # (vocab, dims)

    def project(counts: np.ndarray) -> np.ndarray:
        y = (tf(counts) - mu) @ P
        n = np.linalg.norm(y, axis=1, keepdims=True)
        return (y / np.where(n > 0, n, 1.0)).astype(np.float32)

    n_train = n_proto * per_proto
    train = np.empty((n_train, dims), dtype=np.float32)
    test_by_proto = {}
    CH = 1000
    for lo in range(0, n_proto, CH):
        hi = min(lo + CH, n_proto)
        lam, crng = proto_chunk(lo, hi)
        lam_rep = np.repeat(lam, per_proto, axis=0)
        train[lo * per_proto: hi * per_proto] = project(crng.poisson(lam_rep))
        qsel = np.flatnonzero(is_query_proto[lo:hi])
        if qsel.size:                                   # query = fresh draw
            qvecs = project(crng.poisson(lam[qsel]))
            for i, p_idx in enumerate(qsel):
                test_by_proto[lo + int(p_idx)] = qvecs[i]
    test = np.stack([test_by_proto[int(p)] for p in query_protos])

    tr64 = train.astype(np.float64)
    tr64 /= np.linalg.norm(tr64, axis=1, keepdims=True)
    te64 = test.astype(np.float64)
    te64 /= np.linalg.norm(te64, axis=1, keepdims=True)
    neighbors = np.empty((n_test, k), np.int64)
    dists = np.empty((n_test, k))
    for lo in range(0, n_test, 100):
        cos = te64[lo:lo + 100] @ tr64.T
        a2 = np.maximum(2.0 * (1.0 - cos), 0.0)
        idx = np.argpartition(a2, k, axis=1)[:, :k]
        dd = np.take_along_axis(a2, idx, 1)
        order = np.argsort(dd, axis=1, kind="stable")
        neighbors[lo:lo + 100] = np.take_along_axis(idx, order, 1)
        dists[lo:lo + 100] = np.sqrt(np.take_along_axis(dd, order, 1))

    mats = {"train": train, "test": test,
            "neighbors": neighbors.astype(np.int32),
            "distances": dists.astype(np.float32)}

    class _FakeFile(dict):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeH5:
        @staticmethod
        def File(path, mode):
            return _FakeFile(mats)

    H5.dataset_to_parquet("nyt_heavy.hdf5", out_dir, h5py_mod=_FakeH5)


def run_nyt_heavy(spark) -> dict:
    """The NYT-angular experiment on the heavy-tailed generator — same
    reference config as :func:`run_nyt`; published alongside it in BENCH.md
    so the parity claim carries a hardness-honest second row."""
    return _run_annbench(
        spark, tag="nyt_heavy", dir_name="nyt_heavy_290k_256_v1",
        gen=lambda d: _make_nyt_heavy(d),
        n_trees=200, k_min_vecs=200, dims=256, fit_sample=None,
        max_dist=0.81, max_candidates=20_000, metric="angular")


def run_nyt(spark) -> dict:
    """The reference's NYTimes-256-angular experiment at its own config
    (NTrees 200, KMinVecs 200, MaxDist 0.81 angular, MaxCandidates 20000,
    BatchSize-independent — /root/reference/annbench/annbench_test.go:235-245)
    on the 290k × 256 NYT-shaped dataset; comparable row-for-row with
    README.md:168-172 (published LSH P/R 0.868/0.868 — the reference's
    documented cosine weak regime).  Full-corpus fit like the reference's
    Train."""
    return _run_annbench(
        spark, tag="nyt", dir_name="nyt_shaped_290k_256_v1",
        gen=lambda d: _make_nyt_shaped(d),
        n_trees=200, k_min_vecs=200, dims=256, fit_sample=None,
        max_dist=0.81, max_candidates=20_000, metric="angular")


def run_fmnist(spark) -> dict:
    """The reference's headline ann-benchmarks experiment at its own FMNIST
    config (NTrees 10, KMinVecs 200, MaxDist 2200, MaxCandidates 5000,
    k=10, ε=0.05 — /root/reference/annbench/annbench_test.go:129-150) on
    the full-scale FMNIST-shaped dataset; comparable row-for-row with
    /root/reference/README.md:150-154.  Full-fidelity fit: the forest is
    fit on the WHOLE 60k train set like the reference's Train
    (lsh/lsh.go:107-136)."""
    return _run_annbench(
        spark, tag="fmnist", dir_name="fmnist_shaped_60k_784_v2",
        gen=lambda d: _make_fmnist_shaped(d),
        n_trees=10, k_min_vecs=200, dims=784, fit_sample=None,
        max_dist=2200.0, max_candidates=5000)


def run_siftlike(spark) -> dict:
    """The reference's SIFT-1M experiment at its own config (NTrees 40,
    KMinVecs 300, MaxDist 300, MaxCandidates 10000 —
    /root/reference/annbench/annbench_test.go:188-198;
    README.md:156-160) on a 1M × 128d SIFT-shaped dataset (descriptor-range
    values, prototype structure, σ_b=13 → top-10 NN ≈208, cross-prototype
    ≈597 > MaxDist).  One honest departure: the forest fits on a 100k
    sample with KMinVecs scaled by sample/corpus (30), giving the same
    corpus-level leaf occupancy as the reference's full-corpus fit — a
    1M×128 driver fit is minutes of pure memory streaming for identical
    bucket geometry."""
    return _run_annbench(
        spark, tag="sift", dir_name="sift_shaped_1m_128_v1",
        gen=lambda d: _make_annbench_shaped(
            d, n_proto=100_000, per_proto=10, n_test=1_000, dims=128,
            sig_a=35.0, sig_b=13.0),
        n_trees=40, k_min_vecs=30, dims=128, fit_sample=100_000,
        max_dist=300.0, max_candidates=10_000)


def _run_annbench(spark, tag: str, dir_name: str, gen, n_trees: int,
                  k_min_vecs: int, dims: int, fit_sample: int | None,
                  max_dist: float, max_candidates: int,
                  metric: str = "l2") -> dict:
    """Shared ann-benchmarks runner: train (fit + bucket build), LSH search,
    exact search, ε=0.05 distance-based P/R vs the published ground truth.

    ``metric="angular"``: the ground truth and ``max_dist`` are ANGULAR
    distances (the reference's cosine-regime unit, lsh/helpers.go:218-234);
    the engine searches in cosine-distance space with the exact threshold
    conversion c = a²/2 (monotonic — identical admissions and ranking,
    lsh/helpers.go:240-246) and results are converted back to angular for
    the ε-P/R comparison."""
    from pyspark.sql import functions as F

    from lsh_search_go_spark.config import AnnConfig
    from lsh_search_go_spark.metrics import distance_based_precision_recall
    from lsh_search_go_spark.operators import ann
    from lsh_search_go_spark.operators.bruteforce import brute_force_topk_np

    angular = metric == "angular"
    search_metric = "cosine" if angular else "l2"
    search_max = max_dist * max_dist / 2.0 if angular else max_dist

    def to_reported(df):
        """cosine-space dist → angular for P/R vs the angular ground truth."""
        if not angular:
            return df
        return df.withColumn(
            "dist", F.sqrt(F.greatest(F.lit(0.0), F.lit(2.0) * F.col("dist"))))

    timings: dict[str, float] = {}
    extra: dict = {}
    out_dir = os.path.join(_scratch_dir(), dir_name)
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        gen(out_dir)
        with open(marker, "w") as f:
            f.write("ok")

    train = (spark.read.parquet(f"{out_dir}/train.parquet")
             .withColumnRenamed("vec_id", "id").cache())
    n_train = train.count()
    queries = (spark.read.parquet(f"{out_dir}/test.parquet")
               .select(F.col("vec_id").alias("query_id"), "vec").cache())
    n_q = queries.count()
    gt = spark.read.parquet(f"{out_dir}/ground_truth.parquet").cache()
    gt.count()
    # untimed python-worker pool warm-up: the bucket build is the first
    # Arrow/python stage of this leg and would otherwise pay the one-time
    # pool spin-up (~5 s at 32 workers) inside its timed window — a session
    # cost, not training work (the search legs already get this treatment)
    train.select("id").mapInPandas(lambda it: it, "id long").count()

    acfg = AnnConfig(n_trees=n_trees, k_min_vecs=k_min_vecs, dims=dims,
                     is_angular=angular, seed=42,
                     sample_size=fit_sample or n_train)
    # best-of-2 timed draws on the TRAIN leg too (r4 VERDICT task 1a): the
    # fit drew 12.9 vs 41.0 s across runs on this shared VM, the same
    # single-draw misread the search legs already guard against.  The fit is
    # deterministic, so both draws produce the identical forest — keep the
    # buckets of the faster draw.
    train_draws: list[float] = []
    model = buckets = None
    full_fit = fit_sample is None
    id_type = dict(train.dtypes)["id"]
    for _ in range(2):
        if buckets is not None:
            buckets.unpersist()        # cache-honesty: see timed_best
        t0 = time.time()
        if full_fit:
            # full-corpus fit already pays the one Arrow collect — hash the
            # buckets where the matrix lives (build_buckets_driver: the
            # reference's own in-memory Train regime; the distributed build
            # would re-ship the corpus AND unpickle the forest broadcast in
            # every python worker, ~0.6 GB × 32 at the NYT config).  The
            # distributed path stays what the 1M-vector headline leg and
            # the store tests exercise.
            ids, X = ann.collect_id_vec_matrix(train, "id", "vec")
            model = ann.fit(X, acfg)
            t_fit = round(time.time() - t0, 3)
            buckets = ann.build_buckets_driver(
                spark, ids, X, model, "id", id_type).persist()
        else:
            model = ann.fit_from_df(train, acfg, "vec")
            t_fit = round(time.time() - t0, 3)
            buckets = ann.build_buckets(train, model, "id", "vec").persist()
        buckets.count()
        dt = round(time.time() - t0, 3)
        train_draws.append(dt)
        if dt == min(train_draws):
            extra[f"{tag}_lsh_fit"] = t_fit
            extra[f"{tag}_lsh_bucket_build"] = round(dt - t_fit, 3)
    timings[f"{tag}_lsh_train"] = min(train_draws)
    extra[f"{tag}_lsh_train_draws"] = train_draws

    def lsh():
        # matmul_grouped: at wide dims the pairwise verify's per-candidate
        # vector shipping dominates (tens of GB); grouped ships each touched
        # corpus vector once
        return to_reported(
            ann.search(queries, buckets, train, model, k=10,
                       max_dist=search_max, metric=search_metric,
                       dist_impl="matmul_grouped",
                       max_candidates=max_candidates))

    lsh().count()          # untimed warm-up (worker pool + cache scan)
    # best-of-2 timed draws, all published: identical legs on this shared VM
    # vary up to 2× (BENCH.md), and a single unlucky draw would misread as a
    # regression against the reference's published ms/query
    draws = []
    res = None
    for _ in range(2):
        cand = lsh().persist()
        t0 = time.time()
        cand.count()
        draws.append(round(time.time() - t0, 3))
        if res is None or draws[-1] == min(draws):
            if res is not None:
                res.unpersist()
            res = cand
        else:
            cand.unpersist()
    timings[f"{tag}_lsh_search"] = min(draws)
    extra[f"{tag}_lsh_search_draws"] = draws
    p, r = distance_based_precision_recall(res, gt, epsilon=0.05)
    extra[f"{tag}_lsh_precision"] = round(p, 4)
    extra[f"{tag}_lsh_recall"] = round(r, 4)
    extra[f"{tag}_lsh_search_ms_per_query"] = round(
        timings[f"{tag}_lsh_search"] / n_q * 1000, 2)

    def bf():
        return to_reported(brute_force_topk_np(train, queries, 10,
                                               search_metric,
                                               exclude_self=False))

    bf().count()
    bf_draws = []
    bf_res = None
    for _ in range(2):
        cand = bf().persist()
        t0 = time.time()
        cand.count()
        bf_draws.append(round(time.time() - t0, 3))
        if bf_res is None or bf_draws[-1] == min(bf_draws):
            if bf_res is not None:
                bf_res.unpersist()
            bf_res = cand
        else:
            cand.unpersist()
    timings[f"{tag}_exact_search"] = min(bf_draws)
    extra[f"{tag}_exact_search_draws"] = bf_draws
    pb, rb = distance_based_precision_recall(bf_res, gt, epsilon=0.05)
    extra[f"{tag}_exact_precision"] = round(pb, 4)
    extra[f"{tag}_exact_recall"] = round(rb, 4)
    extra[f"{tag}_exact_search_ms_per_query"] = round(
        timings[f"{tag}_exact_search"] / n_q * 1000, 2)
    extra[f"{tag}_n_train"] = n_train
    extra[f"{tag}_n_test"] = n_q
    extra[f"{tag}_config"] = {"n_trees": n_trees, "k_min_vecs": k_min_vecs,
                              "fit_sample": fit_sample or n_train,
                              "max_dist": max_dist,
                              "max_candidates": max_candidates,
                              "k": 10, "epsilon": 0.05, "metric": metric}
    res.unpersist()
    bf_res.unpersist()
    buckets.unpersist()
    train.unpersist()
    return {"timings": timings, "extra": extra}


def make_session(cpus: int):
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    # SPARK_GRAFT_MASTER overrides for e.g. local-cluster[N,1,8192] — separate
    # executor JVMs, the closest in-sandbox analog of N distinct executors
    # (executor python workers need the repo on their PYTHONPATH: unlike
    # local mode they don't inherit the driver's sys.path)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    repo = os.path.dirname(os.path.abspath(__file__))
    return (
        SparkSession.builder.master(master)
        .config("spark.executorEnv.PYTHONPATH", repo)
        .appName("lsh_search_go_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # JVM heap scaled with concurrency: 32 concurrent tasks of parquet
        # write buffers + Arrow batches thrash a fixed 16g heap (measured:
        # the signatures write drops 26s → 14s at 48g on 32 cores)
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", f"{max(16, cpus * 2)}g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # single ~100MB input parquet must split across all cores
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )


def run_pipeline_only(spark, cpus: int) -> dict:
    """Just the full pipeline on the pre-materialized synth corpus — the
    scaling-matrix payload."""
    from lsh_search_go_spark import synth
    from lsh_search_go_spark.config import DedupConfig
    from lsh_search_go_spark.pipeline import DedupPipeline

    workdir = tempfile.mkdtemp(prefix="bench_pipeline_", dir=_scratch_dir())
    try:
        src_parquet = os.environ.get("SPARK_GRAFT_SYNTH_PARQUET")
        if not src_parquet:
            src_parquet = os.path.join(workdir, "code_files.parquet")
            synth.to_parquet(synth.generate(n_files=SYNTH_FILES, seed=42), src_parquet)
        src = spark.read.parquet(src_parquet)
        n_files = src.count()
        pcfg = DedupConfig(strip_comments=True)
        t0 = time.time()
        pipe = DedupPipeline(spark, pcfg, workdir, impl="pandas",
                             target_partitions=max(cpus, 8))
        pres = pipe.run(src, with_substring=True)
        dt = time.time() - t0
        return {
            "timings": {"pipeline_full_synth": round(dt, 3)},
            "extra": {
                "pipeline_stage_secs": {s.name: round(s.seconds, 2)
                                        for s in pres.stages},
                "synth_files": n_files,
                "files_per_sec": round(n_files / dt, 2),
            },
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def run_headline(spark, sf_dir: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from lsh_search_go_spark import synth
    from lsh_search_go_spark.config import AnnConfig, DedupConfig
    from lsh_search_go_spark.functions import hashing as H
    from lsh_search_go_spark.functions.shingles import with_shingles
    from lsh_search_go_spark.functions.simhash import with_simhash
    from lsh_search_go_spark.operators import ann
    from lsh_search_go_spark.operators.bands import candidate_pairs, explode_bands
    from lsh_search_go_spark.operators.cc import assign_clusters
    from lsh_search_go_spark.operators.exact import exact_dup_groups
    from lsh_search_go_spark.operators.verify import jaccard_verify
    from lsh_search_go_spark.pipeline import DedupPipeline

    cfg = DedupConfig()
    a, b = cfg.minhash_params
    timings: dict[str, float] = {}
    extra: dict = {}

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.col("text").alias("content"))
        .cache()
    )
    n_docs = docs.count()

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    def timed_best(name, fn, n=2):
        """Best-of-n timed draws, all published (r4 VERDICT task 2: identical
        legs on this shared VM vary up to 2×, and r4's exact_dedup/
        signatures/lsh_pairs all-slower draws were unprovable VM noise
        without the draws on record).

        Cache-honesty: the previous draw's persisted result is unpersisted
        BEFORE the next draw runs — Spark's CacheManager serves any later
        IDENTICAL analyzed plan from a registered cache, so keeping draw 1
        persisted turns draw 2 into a cache scan (observed: signatures
        4.8 s draw-1 vs 0.39 s draw-2).  The last draw's (fresh, persisted)
        result is returned; min over draws is the published number."""
        draws: list[float] = []
        res = None
        for _ in range(n):
            if res is not None and hasattr(res, "unpersist"):
                res.unpersist()
            t0 = time.time()
            res = fn()
            draws.append(round(time.time() - t0, 3))
        timings[name] = min(draws)
        extra[name + "_draws"] = draws
        return res

    # 1. exact dedup (hash groupBy)
    timed_best("exact_dedup",
               lambda: exact_dup_groups(docs, "doc_id", "content").count())

    # 2. signature build — the production fused Arrow path
    from lsh_search_go_spark.functions.signatures import with_signatures_fused

    def build_sigs():
        sh = with_signatures_fused(docs, cfg).persist()
        sh.count()
        return sh

    sigs = timed_best("signatures_pandas", build_sigs)

    # 3. LSH bucket join → candidate pairs → exact verify
    def lsh_pairs():
        buckets = explode_bands(sigs.filter(F.size("shingles") > 0), "doc_id", "bands")
        cands = candidate_pairs(buckets, "doc_id", cfg.max_bucket_size)
        p = jaccard_verify(cands, sigs, cfg.jaccard_threshold, "doc_id",
                           "shingles").persist()
        p.count()
        return p

    pairs = timed_best("lsh_dedup_pairs", lsh_pairs)
    extra["n_dup_pairs"] = pairs.count()

    # 4. connected components
    timed("dup_clusters", lambda: assign_clusters(docs, pairs, "doc_id").count())
    # release this section's caches: leaked executor-memory blocks otherwise
    # ride into the ANN and FMNIST legs and show up as their GC pressure
    pairs.unpersist()
    sigs.unpersist()
    docs.unpersist()

    # 5. ANN at benchmark scale: deterministic synthetic gaussian-mixture
    # fixture (the sf0.1 embeddings table is 2k rows — too small for candidate
    # pruning to show; the reference's published numbers are at 60k-1.18M,
    # /root/reference/README.md:150-178).  Search runs the Arrow/numpy
    # distance path (dist_impl="pandas"); brute force is the matmul
    # mapInPandas scan — both are each side's best implementation.
    ann_n = int(os.environ.get("SPARK_GRAFT_ANN_N", "1000000"))
    ann_q = int(os.environ.get("SPARK_GRAFT_ANN_QUERIES", "100"))
    fixture = os.path.join(_scratch_dir(), f"ann_fixture_{ann_n}_64.parquet")
    if not os.path.exists(fixture):
        _make_ann_fixture(ann_n, 64, fixture)
    emb = spark.read.parquet(fixture).cache()
    n_emb = emb.count()
    # k_min_vecs applies to the FIT SAMPLE: scale the reference's
    # corpus-relative KMinVecs=300 (SIFT config, annbench_test.go:188-198) by
    # sample_size/corpus so corpus-level bucket sizes land near ~300 members.
    sample_size = 20000
    k_min = max(4, int(300 * sample_size / max(n_emb, 1)))
    acfg = AnnConfig(n_trees=10, k_min_vecs=k_min, dims=64,
                     is_angular=True, seed=42, sample_size=sample_size)
    queries = emb.filter(F.col("id") < ann_q).select(
        F.col("id").alias("query_id"), "vec"
    ).cache()
    queries.count()

    def ann_build():
        model = ann.fit_from_df(emb, acfg, "vec")
        buckets = ann.build_buckets(emb, model, "id", "vec").persist()
        return model, buckets.count(), buckets

    model, _, buckets = timed("ann_build", ann_build)

    def lsh_search():
        return ann.search(
            queries, buckets, emb, model, k=10, max_dist=2.0, metric="cosine",
            dist_impl="matmul", max_candidates=10_000,  # MaxCandidates analog (SIFT config)
        )

    # one untimed warm-up: first run pays Python-worker pool spin-up and the
    # first full scan of both caches — one-time session costs, not per-search
    # work (brute force gets the same treatment)
    lsh_search().count()
    lsh_res = lsh_search().persist()
    timed("ann_lsh_search", lambda: lsh_res.count())
    from lsh_search_go_spark.operators.bruteforce import brute_force_topk_np

    def bf_search():
        return brute_force_topk_np(emb, queries, 10, "cosine", exclude_self=False)

    bf_search().count()
    bf_res = bf_search().persist()
    n_gt = timed("ann_bruteforce_search", lambda: bf_res.count())
    # set recall of LSH vs exact top-k (A5 analog, annbench.go:143-162)
    hit = lsh_res.join(bf_res, ["query_id", "neighbor_id"], "left_semi").count()
    # pruning evidence: exact-distance evaluations per side
    q_df = queries.select("query_id", F.col("vec").alias("__qvec"))
    n_cands = ann.candidate_pairs(q_df, buckets, model,
                                  max_candidates=10_000).count()
    extra["ann_lsh_dist_evals"] = n_cands
    extra["ann_bruteforce_dist_evals"] = n_emb * ann_q
    extra["ann_pruning_ratio"] = round(n_emb * ann_q / max(n_cands, 1), 1)
    extra["ann_fixture_n"] = n_emb
    extra["ann_queries"] = ann_q

    # 5b. IVF variant on the same fixture (coarse quantizer; nprobe/nlist
    # governs the scan fraction)
    from lsh_search_go_spark.operators import ivf
    import numpy as np

    def ivf_build():
        sample = emb.orderBy("id").limit(20000).toPandas()["vec"]
        X = np.array([np.asarray(v, dtype=np.float64) for v in sample])
        C = ivf.fit_centroids(X, 1000, "cosine")
        inv = ivf.assign(emb, C, "cosine").persist()
        return C, inv.count(), inv

    C, _, inv = timed("ivf_build", ivf_build)

    def ivf_search():
        return ivf.search(queries, inv, emb, C, k=10, max_dist=2.0,
                          metric="cosine", nprobe=8, dist_impl="matmul")

    ivf_search().count()         # untimed warm-up, like the LSH/brute legs
    ivf_res = ivf_search().persist()
    timed("ivf_search", lambda: ivf_res.count())
    ivf_hit = ivf_res.join(bf_res, ["query_id", "neighbor_id"], "left_semi").count()
    extra["ivf_recall_vs_bruteforce"] = round(ivf_hit / max(n_gt, 1), 4)
    extra["ivf_nlist_nprobe"] = [1000, 8]
    ivf_res.unpersist()
    inv.unpersist()
    extra["ann_recall_vs_bruteforce"] = round(hit / max(n_gt, 1), 4)
    extra["ann_speedup"] = round(
        timings["ann_bruteforce_search"] / max(timings["ann_lsh_search"], 1e-9), 2)
    lsh_res.unpersist()
    bf_res.unpersist()
    buckets.unpersist()
    emb.unpersist()          # ~600 MB of vector cache must not ride into
    queries.unpersist()      # the FMNIST leg as resident GC pressure

    # 6. full pipeline on the synthetic code corpus → files/sec headline.
    # The corpus parquet is materialized OUTSIDE the timed window (production
    # reads an Iceberg/parquet table; driver-side data conversion is not
    # pipeline work).  Best-of-3 with all runs reported: identical legs on
    # this shared VM vary up to 2.2× (BENCH.md), so a single draw can
    # masquerade as a regression (r2 VERDICT task 3).
    pipeline_runs = []
    stage_secs_best = None
    n_files = 0
    repeats = int(os.environ.get("SPARK_GRAFT_PIPELINE_REPEATS", "3"))
    src_parquet = os.environ.get("SPARK_GRAFT_SYNTH_PARQUET")
    shared_src = None
    if not src_parquet:
        shared_src = os.path.join(_scratch_dir(),
                                  f"bench_corpus_{SYNTH_FILES}.parquet")
        if not os.path.exists(shared_src):
            synth.to_parquet(synth.generate(n_files=SYNTH_FILES, seed=42),
                             shared_src)
        src_parquet = shared_src
    for _rep in range(repeats):
        workdir = tempfile.mkdtemp(prefix="bench_pipeline_", dir=_scratch_dir())
        try:
            src = spark.read.parquet(src_parquet)
            n_files = src.count()
            pcfg = DedupConfig(strip_comments=True)
            t0 = time.time()
            pipe = DedupPipeline(spark, pcfg, workdir, impl="pandas",
                                 target_partitions=max(cpus, 8))
            pres = pipe.run(src, with_substring=True)
            dt = round(time.time() - t0, 3)   # rounded BEFORE the best-run
            pipeline_runs.append(dt)          # compare (an unrounded dt can
            if dt == min(pipeline_runs):      # never equal its rounded copy)
                stage_secs_best = {s.name: round(s.seconds, 2)
                                   for s in pres.stages}
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    best = min(pipeline_runs)
    timings["pipeline_full_synth"] = best
    extra["pipeline_runs_all"] = pipeline_runs
    extra["pipeline_run_spread"] = round(max(pipeline_runs) / best, 2)
    extra["pipeline_stage_secs"] = stage_secs_best
    extra["synth_files"] = n_files
    extra["files_per_sec"] = round(n_files / best, 2)

    # 7. the reference's own ann-benchmarks experiment, FMNIST-shaped at
    # full scale (gate with SPARK_GRAFT_FMNIST=0 for quick iteration)
    if os.environ.get("SPARK_GRAFT_FMNIST", "1") != "0":
        fm = run_fmnist(spark)
        timings.update(fm["timings"])
        extra.update(fm["extra"])

    extra["n_docs"] = n_docs
    extra["n_embeddings"] = n_emb
    return {"timings": timings, "extra": extra}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--fmnist-only", action="store_true")
    ap.add_argument("--siftlike-only", action="store_true")
    ap.add_argument("--nyt-only", action="store_true")
    ap.add_argument("--nyt-heavy-only", action="store_true")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    if args.scaling:
        run_scaling(args)
        return

    spark = make_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    if args.pipeline_only:
        res = run_pipeline_only(spark, args.cpus)
    elif args.fmnist_only:
        res = run_fmnist(spark)
    elif args.siftlike_only:
        res = run_siftlike(spark)
    elif args.nyt_only:
        res = run_nyt(spark)
    elif args.nyt_heavy_only:
        res = run_nyt_heavy(spark)
    else:
        res = run_headline(spark, args.sf_dir, args.cpus)
    total = round(time.time() - t0, 3)
    sf = args.sf_dir.rstrip("/").split("sf")[-1]
    line = {
        "metric": "headline_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": res["timings"],
        "sf": sf,
        "cpus": args.cpus,
        **res["extra"],
    }
    out = json.dumps(line)
    print(out)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(out + "\n")
    # --pipeline-only runs are scaling sub-legs / quick smokes at arbitrary
    # corpus sizes — their files/sec would overwrite the table's throughput
    # row with non-benchmark numbers (the scaling driver ingests its own
    # consolidated report instead)
    if not args.pipeline_only:
        _ingest_into_baseline(line)
    spark.stop()


def _ingest_into_baseline(line: dict) -> None:
    """Feed this run's numbers to the BASELINE.md measured-table generator
    (r4 VERDICT task 7: one generator, rounds can't drift).  Never lets a
    bookkeeping failure fail the bench itself."""
    try:
        from tools.update_baseline import ingest_bench_line

        ingest_bench_line(line)
    except Exception as e:                                  # noqa: BLE001
        print(f"(baseline table update skipped: {e})", file=sys.stderr)


def run_scaling(args) -> None:
    """Identical pipeline job at local[8] and local[32] over the SAME
    pre-materialized input parquet; efficiency =
    (files_per_sec@32 / files_per_sec@8) / 4."""
    from lsh_search_go_spark import synth

    n_files = int(os.environ.get("SPARK_GRAFT_SCALING_FILES", "100000"))
    legs = [int(x) for x in
            os.environ.get("SPARK_GRAFT_SCALING_CPUS", "8,32").split(",")]
    n_lo, n_hi = min(legs), max(legs)
    factor = n_hi / n_lo
    shared = os.path.join(_scratch_dir(), f"scaling_corpus_{n_files}.parquet")
    if not os.path.exists(shared):
        synth.to_parquet(synth.generate(n_files=n_files, seed=42), shared)
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    results = {}
    for cpus in (n_lo, n_hi):
        best = None
        for rep in range(repeats):
            out = os.path.join(tempfile.gettempdir(),
                               f"bench_scaling_{cpus}_{rep}.json")
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                       SPARK_GRAFT_SYNTH_PARQUET=shared)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus),
                 "--sf-dir", args.sf_dir, "--pipeline-only", "--json-out", out],
                check=True, env=env,
            )
            with open(out) as f:
                r = json.loads(f.read())
            # best-of-N: the sandbox host shows up to 2x run-to-run noise
            # (shared VM); min wall per leg is the standard mitigation
            if best is None or r["files_per_sec"] > best["files_per_sec"]:
                best = r
        results[cpus] = best
    f_lo = results[n_lo]["files_per_sec"]
    f_hi = results[n_hi]["files_per_sec"]
    eff = round((f_hi / f_lo) / factor, 3)
    report = {
        "legs": [n_lo, n_hi],
        f"files_per_sec_local{n_lo}": f_lo,
        f"files_per_sec_local{n_hi}": f_hi,
        "scaling_efficiency": eff,
        f"pipeline_secs_local{n_lo}": results[n_lo]["queries"]["pipeline_full_synth"],
        f"pipeline_secs_local{n_hi}": results[n_hi]["queries"]["pipeline_full_synth"],
        "synth_files": results[n_lo]["synth_files"],
    }
    print(json.dumps(report))
    _ingest_into_baseline(report)  # first: history then includes this run
    with open("BENCH_SCALING.md", "w") as f:
        f.write(render_bench_md(results, report, n_lo, n_hi, factor))


def render_bench_md(results: dict, report: dict, n_lo: int, n_hi: int,
                    factor: float) -> str:
    lines = [
        "# BENCH — measured numbers (this sandbox: single JVM, local mode)",
        "",
        f"## Scaling evidence (N vs {factor:g}N parallelism)",
        "",
        "No real cluster in the sandbox (BASELINE.md): the identical pipeline job",
        f"runs at `local[{n_lo}]` and `local[{n_hi}]` on the same input; efficiency =",
        f"`(files_per_sec@{n_hi} / files_per_sec@{n_lo}) / {factor:g}`.",
        "",
        "| parallelism | pipeline wall s | files/sec |",
        "|---|---|---|",
        f"| local[{n_lo}]  | {report[f'pipeline_secs_local{n_lo}']} | {report[f'files_per_sec_local{n_lo}']} |",
        f"| local[{n_hi}] | {report[f'pipeline_secs_local{n_hi}']} | {report[f'files_per_sec_local{n_hi}']} |",
        "",
        f"**Scaling efficiency {n_lo}→{n_hi}: {report['scaling_efficiency']}** "
        f"(target ≥ 0.8) on {report['synth_files']} synthetic code files.",
        "",
        f"## Pipeline stage timings",
        "",
        "| stage | local[{}] s | local[{}] s |".format(n_lo, n_hi),
        "|---|---|---|",
    ]
    stages_lo = results[n_lo]["pipeline_stage_secs"]
    stages_hi = results[n_hi]["pipeline_stage_secs"]
    for st in stages_lo:
        lines.append(f"| {st} | {stages_lo[st]} | {stages_hi.get(st, '-')} |")
    lines.append("")
    # All prior N→4N pairs (tools/baseline_measured.json history) so a new
    # run extends the record instead of silently replacing it; the headline
    # pair is chosen by the coded policy in tools/update_baseline.py.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tools", "baseline_measured.json")) as f:
            hist = json.load(f).get("scaling", {}).get("history", [])
    except Exception:                                       # noqa: BLE001
        hist = []
    if hist:
        lines += ["## All measured N→4N pairs", "",
                  "| pair | f/s @ N | f/s @ 4N | efficiency | source |",
                  "|---|---|---|---|---|"]
        for h in hist:
            lines.append(
                f"| {h['legs'][0]}→{h['legs'][1]} | {h['files_per_sec_lo']} "
                f"| {h['files_per_sec_hi']} | {h['efficiency']} "
                f"| {h['source']} |")
        lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    main()
