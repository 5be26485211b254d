"""Banded SimHash LSH: bit-slice candidate generation has recall 1.0 vs
brute-force Hamming when n_bands > hamming threshold (pigeonhole)."""

import pytest
from pyspark.sql import functions as F

from lsh_search_go_spark import synth
from lsh_search_go_spark.config import DedupConfig
from lsh_search_go_spark.functions.shingles import with_shingles
from lsh_search_go_spark.functions.simhash import (simhash_band_hashes,
                                                   simhash_candidate_pairs,
                                                   with_simhash, hamming_expr)
from lsh_search_go_spark.operators.verify import hamming_verify

CFG = DedupConfig(strip_comments=True)
HAM_T = 3      # banded guarantee needs n_bands > HAM_T
N_BANDS = 4    # 64 bits → 4 slices of 16 bits


@pytest.fixture(scope="module")
def signed(spark):
    src = synth.to_spark_df(spark, synth.generate(n_files=150, seed=7))
    sh = with_shingles(src, CFG, "sql")
    return with_simhash(sh, CFG, "sql").filter(F.size("shingles") > 0) \
        .select("doc_id", "simhash").persist()


def brute_hamming_pairs(signed, t):
    a = signed.select(F.col("doc_id").alias("src_id"), F.col("simhash").alias("__a"))
    b = signed.select(F.col("doc_id").alias("dst_id"), F.col("simhash").alias("__b"))
    return (
        a.crossJoin(b).filter(F.col("src_id") < F.col("dst_id"))
        .withColumn("hamming", hamming_expr("__a", "__b"))
        .filter(F.col("hamming") <= t)
        .select("src_id", "dst_id", "hamming")
    )


def test_band_hashes_reassemble_signature(spark, signed):
    """Concatenating the 4 × 16-bit slices recovers each 32-bit word."""
    rows = (
        signed.withColumn("bands", simhash_band_hashes("simhash", CFG, N_BANDS))
        .select("simhash", "bands").limit(20).collect()
    )
    assert rows
    for r in rows:
        w = 64 // N_BANDS
        for j, bh in enumerate(r.bands):
            word = r.simhash[(j * w) // 32]
            expect = (word >> ((j % (32 // w)) * w)) & ((1 << w) - 1)
            assert bh == expect
            assert 0 <= bh < (1 << w)


def test_banded_candidates_full_recall_vs_bruteforce(spark, signed):
    gt = {(r.src_id, r.dst_id) for r in brute_hamming_pairs(signed, HAM_T).collect()}
    assert gt, "corpus must contain Hamming-close pairs"
    cands = simhash_candidate_pairs(signed, CFG, N_BANDS, "doc_id", "simhash")
    verified = {
        (r.src_id, r.dst_id)
        for r in hamming_verify(cands, signed, HAM_T, "doc_id", "simhash").collect()
    }
    # pigeonhole: every pair at hamming <= 3 shares one of 4 slices → found
    assert verified == gt
