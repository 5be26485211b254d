#!/usr/bin/env python
"""spark-submit entry point for the dedup pipeline.

Usage (cluster)::

    zip -r lsh_search_go_spark.zip lsh_search_go_spark
    spark-submit --py-files lsh_search_go_spark.zip job.py \
        --input  <parquet/iceberg path or table of code_files> \
        --workdir <checkpoint/output root> \
        [--impl pandas] [--no-substring] [--threshold 0.7] [--seed 42]

Local smoke::

    python job.py --input /tmp/code_files.parquet --workdir /tmp/dedup_run

The input must carry (repo, path, commit, lang, content) — BASELINE.json's
``input_hint`` shape — or a precomputed ``doc_id`` + ``content`` pair.
Outputs land under ``<workdir>/<config_hash>/``: signatures, buckets, pairs,
substring, clusters (+ lineage/, dropped_buckets, manifest.json).  Re-running
with the same config resumes from completed stages.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _local_input_bytes(path: str) -> int:
    """Total bytes of a local parquet file/dir; big-input sentinel for
    non-local paths (object stores, Iceberg table names) so the wide-layout
    defaults apply there."""
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if os.path.isdir(path):
            # recurse: a partitioned parquet dir nests its files under
            # key=value subdirs — a top-level-only sum would report ~0 bytes
            # and misclassify a multi-GB input as 'small'
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        continue
            return total
    except OSError:
        pass
    return 1 << 62


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--impl", default="pandas", choices=["pandas", "sql"])
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--shingle-k", type=int, default=3)
    ap.add_argument("--num-perm", type=int, default=128)
    ap.add_argument("--num-bands", type=int, default=32)
    ap.add_argument("--strip-comments", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="drop '#...' line comments before shingling "
                         "(--no-strip-comments to disable)")
    ap.add_argument("--pairs-strategy", default="minhash",
                    choices=["minhash", "simhash"],
                    help="candidate generator: MinHash bands or SimHash "
                         "bit-slice bands (+Hamming verify)")
    ap.add_argument("--simhash-bits", type=int, default=None,
                    help="SimHash signature width (default 64; the simhash "
                         "pairs strategy defaults to 128 so its 16 bands have "
                         "8-bit domains while still exceeding the Hamming "
                         "threshold — see DedupConfig validation)")
    ap.add_argument("--hamming-threshold", type=int, default=None,
                    help="max Hamming distance for simhash dup admission "
                         "(default 10; must stay below simhash-bands for "
                         "the banded strategy's pigeonhole recall guarantee "
                         "— e.g. 3 with --simhash-bands 4)")
    ap.add_argument("--simhash-bands", type=int, default=None,
                    help="bit-slice bands for the simhash strategy (default "
                         "16; bands wider than 32 bits are folded through a "
                         "Mersenne-prime polynomial hash — e.g. "
                         "--simhash-bits 256 --simhash-bands 4 gives 64-bit "
                         "bands for web-scale low-collision buckets)")
    ap.add_argument("--no-substring", action="store_true")
    ap.add_argument("--master", default=None,
                    help="override master for local runs (spark-submit sets it otherwise)")
    ap.add_argument("--conf", action="append", default=[], metavar="K=V",
                    help="extra spark conf (repeatable); beats the local-mode defaults")
    args = ap.parse_args()
    extra_conf = dict(kv.split("=", 1) for kv in args.conf)

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("lsh_search_go_spark-dedup")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    # Local-mode defaults, applied ONLY when this process is the launcher
    # (plain `python job.py`): Spark's stock 200 shuffle partitions + 128m
    # scan splits are cluster sizing. Measured at local[8] on tmpfs
    # (BENCH.md data-scaling table): sub-~500MB inputs run 15-33% faster
    # with 16m scan splits + core-matched shuffle partitions (100k files
    # 135.0→90.3 s, 300k 338.8→286.6 s), while at 1M files/888MB the same
    # setting LOSES 5-15% (pairs/substring want the wider 64m/200 layout:
    # 949.8 s vs 992-1096 s) — so the split is size-aware. Under
    # spark-submit the JVM is already up and the submitter's --conf owns
    # every knob; touch nothing there. --conf here beats these defaults.
    launched_by_spark_submit = ("PYSPARK_GATEWAY_PORT" in os.environ
                                or "SPARK_APPLICATION_ID" in os.environ)
    m = re.match(r"local(?:-cluster)?\[(\d+|\*)", args.master or "")
    if m and not launched_by_spark_submit:
        cores = os.cpu_count() if m.group(1) == "*" else int(m.group(1))
        small = _local_input_bytes(args.input) < 500 * 1024 ** 2
        defaults = {
            "spark.sql.files.maxPartitionBytes": "16m" if small else "64m",
        }
        if small:
            defaults["spark.sql.shuffle.partitions"] = str(max(8, 2 * cores))
        if "--driver-memory" not in os.environ.get("PYSPARK_SUBMIT_ARGS", ""):
            defaults["spark.driver.memory"] = f"{max(16, 2 * cores)}g"
        for key, val in defaults.items():
            if key not in extra_conf:
                builder = builder.config(key, val)
    for key, val in extra_conf.items():
        builder = builder.config(key, val)
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from lsh_search_go_spark.config import DedupConfig
    from lsh_search_go_spark.pipeline import DedupPipeline
    from lsh_search_go_spark.sources.io import read_table

    cfg = DedupConfig(
        seed=args.seed,
        shingle_k=args.shingle_k,
        num_perm=args.num_perm,
        num_bands=args.num_bands,
        rows_per_band=args.num_perm // args.num_bands,
        jaccard_threshold=args.threshold,
        strip_comments=args.strip_comments,
        pairs_strategy=args.pairs_strategy,
        simhash_bits=(args.simhash_bits if args.simhash_bits is not None
                      else (128 if args.pairs_strategy == "simhash" else 64)),
        **({"simhash_bands": args.simhash_bands}
           if args.simhash_bands is not None else {}),
        **({"hamming_threshold": args.hamming_threshold}
           if args.hamming_threshold is not None else {}),
    )
    source = read_table(spark, args.input)
    pipe = DedupPipeline(spark, cfg, args.workdir, impl=args.impl)
    result = pipe.run(source, with_substring=not args.no_substring)
    print(json.dumps({
        "workdir": result.workdir,
        "stages": [{"name": s.name, "rows": s.rows,
                    "seconds": round(s.seconds, 2), "resumed": s.resumed}
                   for s in result.stages],
        "total_seconds": round(result.total_seconds, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
