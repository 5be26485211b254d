"""The north-rule ship contract: the pipeline runs as a genuine
``spark-submit --py-files lsh_search_go_spark.zip job.py`` job.

The test stages job.py + the zipped package in a TEMP directory and runs
spark-submit from there, so the package is importable ONLY through the
--py-files zip (job.py's own sys.path fallback points at the temp dir,
which holds no package) — the exact deployment shape of a cluster submit,
where executors receive the zip and nothing else.
"""

import json
import os
import shutil
import subprocess
import zipfile

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_py_files_zip(tmp_path):
    submit = _spark_submit()
    if submit is None:  # pragma: no cover
        pytest.skip("no spark-submit on PATH")

    # stage: zip the package, copy job.py — nothing else from the repo
    pkg_zip = str(tmp_path / "lsh_search_go_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(REPO, "lsh_search_go_spark")
        for root, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    shutil.copy(os.path.join(REPO, "job.py"), tmp_path / "job.py")

    # small corpus with one planted duplicate triple
    base = "def f(x):\n    return x + 1\n" * 20
    rows = [("r0", f"p{i}.py", "c0", "py", base + f"# v{i}\n") for i in range(3)]
    rows += [("r1", f"q{i}.py", "c0", "py",
              f"class C{i}:\n    value = {i}\n" + "x = 1\n" * (10 + i))
             for i in range(8)]
    src = str(tmp_path / "corpus.parquet")
    pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"]
                 ).to_parquet(src)

    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
    env.pop("PYTHONPATH", None)      # the zip must be the only package source
    workdir = str(tmp_path / "out")
    proc = subprocess.run(
        [submit, "--master", "local[2]", "--py-files", pkg_zip,
         str(tmp_path / "job.py"),
         "--input", src, "--workdir", workdir],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    # one JSON report line on stdout with the stage summary
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert [s["name"] for s in report["stages"]][:2] == ["signatures", "pairs"]

    # clusters output exists and the planted triple is one cluster
    cfg_dirs = [d for d in os.listdir(workdir)
                if os.path.isdir(os.path.join(workdir, d))]
    assert len(cfg_dirs) == 1
    import duckdb

    clusters = duckdb.sql(
        f"select cluster_id, count(*) n from "
        f"read_parquet('{workdir}/{cfg_dirs[0]}/clusters/*.parquet') "
        f"group by 1 order by n desc").df()
    assert int(clusters["n"].iloc[0]) == 3, clusters
