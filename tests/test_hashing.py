"""Unit tests for the hash primitives: three-backend bit parity + exact values.

Mirrors the reference's exact-value unit style (TestPlane/TestGetHash,
/root/reference/lsh/lsh_test.go:15-44): known inputs, known outputs.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from lsh_search_go_spark.config import MERSENNE31, DedupConfig
from lsh_search_go_spark.functions import hashing as H


def poly31_ref(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % MERSENNE31
    return h


def test_poly31_exact_values():
    got = H.poly31_np(pd.Series(["a", "ab", "hello", ""]))
    assert got.tolist() == [poly31_ref("a"), poly31_ref("ab"), poly31_ref("hello"), 0]
    assert poly31_ref("a") == 97


def test_poly31_duckdb_parity():
    words = ["a", "hello", "Zyzzyva", "x1 y2", "héllo", "naïve", "Ünïcode"]
    con = duckdb.connect()
    for w in words:
        duck = con.sql(f"select {H.duck_poly31(repr(w))}").fetchone()[0]
        assert duck == poly31_ref(w)


def test_poly31_non_ascii_batch_independent():
    """Regression: offsets are character counts, so the code buffer must be
    one codepoint per character — a non-ASCII doc earlier in the batch must
    not shift later docs' hashes (ADVICE r1: UTF-8 byte folding misaligned
    every subsequent token)."""
    alone = H.poly31_np(pd.Series(["abc"]))
    after_nonascii = H.poly31_np(pd.Series(["héllö wörld", "abc"]))
    assert alone[0] == after_nonascii[1] == poly31_ref("abc") == 96354
    # and the non-ASCII hash itself folds codepoints (matches ord())
    assert after_nonascii[0] == poly31_ref("héllö wörld")
    # non-BMP codepoints fold too
    got = H.poly31_np(pd.Series(["a\U0001F680b", "abc"]))
    assert got.tolist() == [poly31_ref("a\U0001F680b"), poly31_ref("abc")]


def test_combine_matches_scalar():
    mat = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.int64)
    exp = []
    for row in mat:
        h = 0
        for v in row:
            h = (h * 1_000_003 + int(v)) % MERSENNE31
        exp.append(h)
    assert H.combine_np(mat).tolist() == exp


def test_windowed_combine_short_input_empty():
    assert H.windowed_combine_np(np.array([1, 2], dtype=np.int64), 3).size == 0


def test_minhash_np_matches_scalar():
    cfg = DedupConfig()
    a, b = cfg.minhash_params
    sh = np.array([17, 99, 12345], dtype=np.int64)
    sig = H.minhash_np(sh, np.array(a, dtype=np.int64), np.array(b, dtype=np.int64))
    for i in (0, 7, 127):
        exp = min((a[i] * int(h) + b[i]) % MERSENNE31 for h in sh)
        assert sig[i] == exp


def test_minhash_params_deterministic_and_valid():
    cfg = DedupConfig()
    a, b = cfg.minhash_params
    a2, b2 = DedupConfig().minhash_params
    assert a == a2 and b == b2
    assert len(a) == cfg.num_perm
    assert all(1 <= x < MERSENNE31 for x in a)
    assert all(0 <= x < MERSENNE31 for x in b)
    assert len(set(a)) == len(a)  # no degenerate repeats at this size


def test_config_validation():
    with pytest.raises(ValueError):
        DedupConfig(num_perm=10, num_bands=3, rows_per_band=3)
    assert DedupConfig(seed=1).config_hash != DedupConfig(seed=2).config_hash


def test_simhash_banded_strategy_band_width_guard():
    """4-bit band domains overflow every bucket at corpus scale — the config
    must reject them for the banded strategy (r2 review finding)."""
    with pytest.raises(ValueError, match="band width"):
        DedupConfig(pairs_strategy="simhash")  # 64 bits / 16 bands = 4 bits
    cfg = DedupConfig(pairs_strategy="simhash", simhash_bits=128)
    assert cfg.simhash_bits // cfg.simhash_bands == 8
