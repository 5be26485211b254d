"""job.py CLI helpers (no Spark session needed)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import job


def test_local_input_bytes_file(tmp_path):
    p = tmp_path / "x.parquet"
    p.write_bytes(b"z" * 1234)
    assert job._local_input_bytes(str(p)) == 1234


def test_local_input_bytes_dir_recursive(tmp_path):
    # partitioned-parquet shape: files nest under key=value subdirs (r6 fix:
    # the old top-level-only sum reported ~0 and misclassified the input)
    sub = tmp_path / "lang=py"
    sub.mkdir()
    (sub / "part-0.parquet").write_bytes(b"y" * 70)
    (tmp_path / "_SUCCESS").write_bytes(b"")
    (tmp_path / "part-1.parquet").write_bytes(b"x" * 30)
    import job
    assert job._local_input_bytes(str(tmp_path)) == 100


def test_local_input_bytes_dir(tmp_path):
    (tmp_path / "a").write_bytes(b"z" * 100)
    (tmp_path / "b").write_bytes(b"z" * 50)
    assert job._local_input_bytes(str(tmp_path)) == 150


def test_local_input_bytes_nonlocal_is_big():
    # Iceberg table names / object-store URIs must fall into the wide-layout
    # (big-input) defaults, not the small-input tuning
    for path in ("catalog.db.code_files", "s3://bucket/prefix",
                 "/no/such/dir/at/all"):
        assert job._local_input_bytes(path) >= 500 * 1024 ** 2
