"""Three-backend parity for shingles / MinHash / SimHash on real-ish text,
plus semantic sanity (near-dup texts → near signatures)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from lsh_search_go_spark.config import DedupConfig
from lsh_search_go_spark.functions import hashing as H
from lsh_search_go_spark.functions import shingles as S
from lsh_search_go_spark.functions import simhash as SH

TEXTS = [
    "the quick brown fox jumps over the lazy dog and runs away fast",
    "the quick brown fox jumps over the lazy dog and walks away fast",
    "def main(): return compute(x) + compute(y) - offset  # comment",
    "completely different content with no overlap whatsoever here now",
    "",
    "one two",
    # non-ASCII: exercises the codepoint (not byte) folding across all three
    # backends — regression for the r1 ADVICE UTF-8 misalignment bug
    "héllo wörld ünïcode naïve café résumé tokens go hère todäy",
    "mixed ascii and ünïcode tokens in one документ με unicode συμβολα",
]

CFG = DedupConfig()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, content string"
    )


def _collect_shingles(df):
    return {r.doc_id: list(r.shingles) for r in df.select("doc_id", "shingles").collect()}


def test_shingle_backends_and_oracle_agree(spark, docs):
    sql_sh = _collect_shingles(S.with_shingles(docs, CFG, "sql"))
    pd_sh = _collect_shingles(S.with_shingles(docs, CFG, "pandas"))
    assert sql_sh == pd_sh

    con = duckdb.connect()
    values = ",".join(f"({i}, '{t}')" for i, t in enumerate(TEXTS))
    con.execute(f"create table t as select * from (values {values}) v(doc_id, content)")
    duck = {
        d: list(s)
        for d, s in con.sql(
            f"select doc_id, {S.duck_shingle_hashes('content', CFG)} from t"
        ).fetchall()
    }
    assert sql_sh == duck


def test_minhash_three_way(spark, docs):
    a, b = CFG.minhash_params
    an, bn = np.array(a, dtype=np.int64), np.array(b, dtype=np.int64)
    shingled = S.with_shingles(docs, CFG, "sql").filter("size(shingles) > 0")
    rows = (
        shingled.withColumn("sig", H.minhash_signature("shingles", a, b))
        .select("doc_id", "shingles", "sig")
        .collect()
    )
    assert rows
    for r in rows:
        np_sig = H.minhash_np(np.array(r.shingles, dtype=np.int64), an, bn)
        assert np_sig.tolist() == list(r.sig)


def test_minhash_estimates_jaccard_direction(spark, docs):
    """Near-dup texts agree on far more MinHash rows than unrelated texts."""
    a, b = CFG.minhash_params
    shingled = S.with_shingles(docs, CFG, "sql")
    sigs = {
        r.doc_id: list(r.sig)
        for r in shingled.filter("size(shingles) > 0")
        .withColumn("sig", H.minhash_signature("shingles", a, b))
        .select("doc_id", "sig")
        .collect()
    }
    agree = lambda x, y: sum(u == v for u, v in zip(sigs[x], sigs[y])) / CFG.num_perm
    assert agree(0, 1) > 0.5
    assert agree(0, 3) < 0.2


def test_simhash_three_way_and_hamming(spark, docs):
    shingled = S.with_shingles(docs, CFG, "sql")
    sql_rows = {
        r.doc_id: list(r.simhash)
        for r in SH.with_simhash(shingled, CFG, "sql").select("doc_id", "simhash").collect()
    }
    pd_rows = {
        r.doc_id: list(r.simhash)
        for r in SH.with_simhash(shingled, CFG, "pandas").select("doc_id", "simhash").collect()
    }
    # empty-shingle docs: SQL backend yields all-zero words too
    assert sql_rows == pd_rows

    # numpy single-doc path agrees
    sh_map = _collect_shingles(shingled)
    for d, sh in sh_map.items():
        got = SH.simhash_np(np.array(sh, dtype=np.int64), CFG)
        assert got.tolist() == sql_rows[d]

    # DuckDB mirror
    con = duckdb.connect()
    values = ",".join(f"({i}, '{t}')" for i, t in enumerate(TEXTS))
    con.execute(f"create table t as select * from (values {values}) v(doc_id, content)")
    duck = {
        d: list(s)
        for d, s in con.sql(
            "select doc_id, "
            + SH.duck_simhash_words(S.duck_shingle_hashes("content", CFG), CFG)
            + " from t"
        ).fetchall()
    }
    assert sql_rows == duck

    # Hamming orders by similarity: the one-word-edit pair is strictly
    # closer than unrelated text (E[ham] ≈ 64·θ/π; J≈0.57 → ~15, J≈0 → ~32)
    def ham(x, y):
        return sum(bin(a ^ b).count("1") for a, b in zip(sql_rows[x], sql_rows[y]))

    assert ham(0, 1) < ham(0, 3)
    assert ham(0, 0) == 0
    assert ham(0, 3) >= 16
    # all words fit 32 bits
    for words in sql_rows.values():
        assert all(0 <= w < (1 << 32) for w in words)


def test_fused_matches_composed(spark, docs):
    """The fused single-UDF signature kernel must equal the composed
    (oracle-gated) per-step definitions column-for-column."""
    from lsh_search_go_spark.functions.signatures import with_signatures_fused

    a, b = CFG.minhash_params
    composed = (
        S.with_shingles(docs, CFG, "sql")
        .withColumn("minhash", H.minhash_signature("shingles", a, b))
        .withColumn("bands", H.banded_hashes("minhash", CFG.num_bands,
                                             CFG.rows_per_band))
        .persist()
    )
    composed = SH.with_simhash(composed, CFG, "sql")
    fused = with_signatures_fused(docs, CFG)
    cols = ["shingles", "minhash", "bands", "simhash"]
    comp = {r.doc_id: [list(r[c]) for c in cols]
            for r in composed.select("doc_id", *cols).collect()}
    fus = {r.doc_id: [list(r[c]) for c in cols]
           for r in fused.select("doc_id", *cols).collect()}
    # empty-shingle docs: composed SQL minhash yields sentinel-free values on
    # empty arrays? both paths emit the same; compare only non-empty docs for
    # minhash/bands, everything for shingles/simhash
    for d in comp:
        assert comp[d][0] == fus[d][0], f"shingles differ for {d}"
        assert comp[d][3] == fus[d][3], f"simhash differ for {d}"
        if comp[d][0]:
            assert comp[d][1] == fus[d][1], f"minhash differ for {d}"
            assert comp[d][2] == fus[d][2], f"bands differ for {d}"


def test_fused_matches_composed_strip_comments(spark):
    """Fused byte-level tokenizer vs composed SQL with comment stripping ON
    and adversarial whitespace (tabs, CRLF, vtab/formfeed, glued boundaries,
    comment-only docs)."""
    from lsh_search_go_spark.functions.signatures import with_signatures_fused

    texts = [
        "def f(x):\n    return x  # trailing comment\nprint(f(1))",
        "#whole line comment\nreal code here",
        "multi\t\ttabs\r\nand crlf\x0bvtab\x0cformfeed",
        "#only comment no newline",
        "a#b c\nd",
        "## double hash\n#\nafter",
        "",
    ]
    cfg = DedupConfig(strip_comments=True)
    docs2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, content string"
    )
    a, b = cfg.minhash_params
    composed = (
        S.with_shingles(docs2, cfg, "sql")
        .withColumn("minhash", H.minhash_signature("shingles", a, b))
        .persist()
    )
    fused = with_signatures_fused(docs2, cfg)
    comp = {r.doc_id: (list(r.shingles), list(r.minhash))
            for r in composed.select("doc_id", "shingles", "minhash").collect()}
    fus = {r.doc_id: (list(r.shingles), list(r.minhash), r.norm_text)
           for r in fused.select("doc_id", "shingles", "minhash",
                                 "norm_text").collect()}
    from lsh_search_go_spark.operators.substring import normalized_text_expr
    norm_sql = {r.doc_id: r.n for r in docs2.select(
        "doc_id", normalized_text_expr("content", cfg).alias("n")).collect()}
    for d, (sh, mh) in comp.items():
        assert fus[d][0] == sh, f"shingles differ for {d}"
        if sh:
            assert fus[d][1] == mh, f"minhash differ for {d}"
        assert fus[d][2] == norm_sql[d], f"norm_text differs for {d}"


def test_banded_hashes_three_way(spark, docs):
    a, b = CFG.minhash_params
    shingled = S.with_shingles(docs, CFG, "sql").filter("size(shingles) > 0")
    rows = (
        shingled.withColumn("sig", H.minhash_signature("shingles", a, b))
        .withColumn("bands", H.banded_hashes("sig", CFG.num_bands, CFG.rows_per_band))
        .select("doc_id", "shingles", "bands")
        .collect()
    )
    an, bn = np.array(a, dtype=np.int64), np.array(b, dtype=np.int64)
    for r in rows:
        sig = H.minhash_np(np.array(r.shingles, dtype=np.int64), an, bn)
        assert H.banded_np(sig, CFG.num_bands, CFG.rows_per_band).tolist() == list(r.bands)


def test_whitespace_class_matches_sql_backend(spark):
    """\\x1c-\\x1f are NOT whitespace in Java/RE2 \\s (the SQL backend and
    DuckDB oracle); the pandas paths must agree — and the fused fast path
    must produce the same tokens whether or not a non-ASCII doc shares the
    batch (r2 review finding)."""
    from lsh_search_go_spark.functions.signatures import with_signatures_fused

    texts = ["a\x1cb c", "x\x0by z"]          # \x1c: not ws; \x0b: ws
    cfg = DedupConfig()
    docs2 = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                  "doc_id int, content string")
    sql_sh = _collect_shingles(S.with_shingles(docs2, cfg, "sql"))
    pd_sh = _collect_shingles(S.with_shingles(docs2, cfg, "pandas"))
    assert sql_sh == pd_sh
    fused_ascii = {r.doc_id: list(r.shingles)
                   for r in with_signatures_fused(docs2, cfg)
                   .select("doc_id", "shingles").collect()}
    assert fused_ascii == sql_sh
    # same docs co-batched with a non-ASCII doc → fallback path, same result
    docs3 = spark.createDataFrame(
        [(0, texts[0]), (1, texts[1]), (2, "ünïcode döc")],
        "doc_id int, content string").coalesce(1)
    fused_mixed = {r.doc_id: list(r.shingles)
                   for r in with_signatures_fused(docs3, cfg)
                   .select("doc_id", "shingles").collect()}
    for d in (0, 1):
        assert fused_mixed[d] == sql_sh[d], f"batch-composition-dependent doc {d}"
