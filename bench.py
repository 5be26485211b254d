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

    # 1. exact dedup (hash groupBy)
    timed("exact_dedup", lambda: exact_dup_groups(docs, "doc_id", "content").count())

    # 2. signature build — the production fused Arrow path
    from lsh_search_go_spark.functions.signatures import with_signatures_fused

    def build_sigs():
        sh = with_signatures_fused(docs, cfg)
        return sh.persist(), sh.count()

    sigs, _ = timed("signatures_pandas", build_sigs)

    # 3. LSH bucket join → candidate pairs → exact verify
    def lsh_pairs():
        buckets = explode_bands(sigs.filter(F.size("shingles") > 0), "doc_id", "bands")
        cands = candidate_pairs(buckets, "doc_id", cfg.max_bucket_size)
        return jaccard_verify(cands, sigs, cfg.jaccard_threshold, "doc_id",
                              "shingles").persist()

    pairs = timed("lsh_dedup_pairs", lambda: (lambda p: (p, p.count()))(lsh_pairs())[0])
    extra["n_dup_pairs"] = pairs.count()

    # 4. connected components
    timed("dup_clusters", lambda: assign_clusters(docs, pairs, "doc_id").count())

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

    # 6. full pipeline on the synthetic code corpus → files/sec headline.
    # The corpus parquet is materialized OUTSIDE the timed window (production
    # reads an Iceberg/parquet table; driver-side data conversion is not
    # pipeline work).
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
        timings["pipeline_full_synth"] = round(dt, 3)
        extra["pipeline_stage_secs"] = {s.name: round(s.seconds, 2)
                                        for s in pres.stages}
        extra["synth_files"] = n_files
        extra["files_per_sec"] = round(n_files / dt, 2)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    extra["n_docs"] = n_docs
    extra["n_embeddings"] = n_emb
    return {"timings": timings, "extra": extra}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--pipeline-only", action="store_true")
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
    spark.stop()


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
    return "\n".join(lines)


if __name__ == "__main__":
    main()
