"""Fused signature computation: ONE Arrow UDF for the pipeline hot path.

Chaining separate pandas UDFs (shingles → minhash → simhash) looks modular
but Spark nests the upstream UDF into each downstream one —
``ArrowEvalPython [udf(content), udf(udf(content)), udf(udf(content))]`` —
re-running shingling once per consumer (measured 3× the work and 3× the
Arrow traffic).  The pipeline therefore computes text →
(shingles, minhash, bands, simhash) in a single fused UDF; the composable
per-step functions in shingles.py / hashing.py / simhash.py remain the
oracle-gated and unit-tested definitions this fused kernel must match
(tests/test_signatures.py::test_fused_matches_composed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lsh_search_go_spark.config import DedupConfig
from lsh_search_go_spark.functions import hashing as H
from lsh_search_go_spark.functions.simhash import simhash_segments_np

SIG_STRUCT = T.StructType([
    T.StructField("shingles", T.ArrayType(T.LongType())),
    T.StructField("minhash", T.ArrayType(T.LongType())),
    T.StructField("bands", T.ArrayType(T.LongType())),
    T.StructField("simhash", T.ArrayType(T.LongType())),
    T.StructField("norm_text", T.StringType()),
    T.StructField("first_sh", T.LongType()),
    T.StructField("last_sh", T.LongType()),
])


def _normalize_series(texts: pd.Series, cfg: DedupConfig) -> pd.Series:
    """Normalized, single-space-joined token stream per doc — all C-level
    pandas string kernels, no per-token Python objects."""
    s = texts.fillna("")
    if cfg.strip_comments:
        s = s.str.replace(r"#[^\n]*", " ", regex=True)
    if cfg.lowercase:
        s = s.str.lower()
    return s.str.replace(r"\s+", " ", regex=True).str.strip()


def _tokenize_batch(texts: pd.Series, cfg: DedupConfig):
    """Normalization + tokenization + token hashing, byte-vectorized.

    Semantics identical to the SQL ``tokens_expr`` + char poly31: tokens are
    maximal non-whitespace runs of the normalized text; each token's hash
    folds its CODEPOINTS.  The numpy fast path works on the ASCII byte level
    (codepoint == byte); any non-ASCII byte falls back to the object path.

    Returns (norm: pd.Series[str], counts, flat_hashes, starts) where
    flat_hashes/starts describe the per-doc token-hash segments.

    Why: pandas ``str.split`` materializes every token as a Python object —
    allocator-bound work that neither vectorizes nor scales across executor
    cores.  This path never creates a token object: one byte buffer, boundary
    masks, and a position loop bounded by the longest token.
    """
    norm = _normalize_series(texts, cfg)
    joined = ("\n".join(norm.tolist()) + "\n").encode("utf-8", errors="surrogatepass")
    arr = np.frombuffer(joined, dtype=np.uint8)
    if (arr >= 128).any():  # non-ASCII: codepoint != byte → object path
        tok_lists = norm.str.split(" ")
        empty = norm == ""
        if empty.any():
            tok_lists = tok_lists.where(
                ~empty, other=pd.Series([[]] * int(empty.sum()),
                                        index=tok_lists.index[empty]))
        counts = tok_lists.str.len().to_numpy(dtype=np.int64)
        flat = pd.Series([t for xs in tok_lists for t in xs], dtype=object)
        flat_hashes = H.poly31_np(flat)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        return norm, counts, flat_hashes, starts

    ndocs = len(norm)
    is_sep = (arr == 32) | (arr == 10)           # ' ' between tokens, '\n' between docs
    prev_sep = np.empty_like(is_sep)
    prev_sep[0] = True
    prev_sep[1:] = is_sep[:-1]
    tok_start = (~is_sep) & prev_sep             # first byte of each token
    tstarts = np.flatnonzero(tok_start)
    # every token ends at the first separator after its start; seps are sorted
    seps = np.flatnonzero(is_sep)
    tends = seps[np.searchsorted(seps, tstarts)]
    tlens = tends - tstarts
    ntok = tstarts.shape[0]
    # per-doc token counts: doc d spans bytes [doc_off[d], doc_off[d+1]);
    # '\n' positions delimit docs
    nl = np.flatnonzero(arr == 10)
    doc_ends = nl                                 # one '\n' per doc
    counts = np.searchsorted(tstarts, doc_ends, side="left")
    counts[1:] = counts[1:] - counts[:-1]
    counts = counts.astype(np.int64)
    starts = np.zeros(ndocs, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    # poly31 over token bytes: position loop bounded by the longest token
    # (tried length-sorted prefix slices and length-grouped dense gathers;
    # the plain boolean-mask loop measures fastest — gathers stay in the
    # source byte order, best cache locality).
    h = np.zeros(ntok, dtype=np.int64)
    if ntok:
        a64 = arr.astype(np.int64)
        for pos in range(int(tlens.max())):
            active = tlens > pos
            h[active] = (h[active] * 31 + a64[tstarts[active] + pos]) % H.P
    return norm, counts, h, starts


def _batch_shingles(flat_hashes: np.ndarray, counts: np.ndarray,
                    starts: np.ndarray, k: int):
    """Whole-batch k-shingling: sliding-window combine over the flat token
    hashes with doc-boundary masking, then per-doc distinct+sort via ONE
    lexsort — no per-document Python loop.

    Returns (sh_flat, sh_counts, first_sh, last_sh): segment-encoded DISTINCT
    SORTED shingle hashes plus each doc's first/last positional shingle (−1
    when the doc has fewer than k tokens)."""
    ndocs = counts.shape[0]
    total = int(counts.sum())
    first_sh = np.full(ndocs, -1, dtype=np.int64)
    last_sh = np.full(ndocs, -1, dtype=np.int64)
    if total < k:
        return (np.zeros(0, dtype=np.int64), np.zeros(ndocs, dtype=np.int64),
                first_sh, last_sh)
    win = H.windowed_combine_np(flat_hashes, k)          # (total-k+1,)
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
    valid = doc_of[: total - k + 1] == doc_of[k - 1:]    # window within one doc
    wdoc = doc_of[: total - k + 1][valid]
    whash = win[valid]
    # first/last positional shingle per doc (window at starts[d] / end)
    has = counts >= k
    first_sh[has] = win[starts[has]]
    last_sh[has] = win[starts[has] + counts[has] - k]
    # distinct+sort per doc: one lexsort over (doc, hash), then boundary dedup
    order = np.lexsort((whash, wdoc))
    sd, sh = wdoc[order], whash[order]
    keep = np.empty(sd.shape[0], dtype=bool)
    if sd.shape[0]:
        keep[0] = True
        keep[1:] = (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])
    sd, sh_flat = sd[keep], sh[keep]
    sh_counts = np.bincount(sd, minlength=ndocs).astype(np.int64)
    return sh_flat, sh_counts, first_sh, last_sh


def with_signatures_fused(df: DataFrame, cfg: DedupConfig,
                          content_col: str | None = None) -> DataFrame:
    """Adds shingles/minhash/bands/simhash + the substring-pass inputs
    (norm_text, first/last shingle keys) in one Arrow pass over content."""
    content_col = content_col or cfg.content_col
    a, b = cfg.minhash_params
    an = np.asarray(a, dtype=np.int64)
    bn = np.asarray(b, dtype=np.int64)
    num_bands, rows_per_band = cfg.num_bands, cfg.rows_per_band
    k = cfg.shingle_k

    @F.pandas_udf(SIG_STRUCT)
    def udf(texts: pd.Series) -> pd.DataFrame:
        norm, counts, flat_hashes, starts = _tokenize_batch(texts, cfg)
        n = len(counts)
        sh_flat, sh_counts, first_sh, last_sh = _batch_shingles(
            flat_hashes, counts, starts, k)
        sigs = H.minhash_segments_np(sh_flat, sh_counts, an, bn)
        bands = H.banded_batch_np(sigs, num_bands, rows_per_band)
        simw = simhash_segments_np(sh_flat, sh_counts, cfg)
        bounds = np.cumsum(sh_counts)[:-1]
        sh_lists = [x.tolist() for x in np.split(sh_flat, bounds)]
        return pd.DataFrame({
            "shingles": sh_lists,
            "minhash": list(sigs.tolist()),
            "bands": list(bands.tolist()),
            "simhash": list(simw.tolist()),
            "norm_text": norm,
            "first_sh": first_sh,
            "last_sh": last_sh,
        })

    tmp = df.withColumn("__sig", udf(F.col(content_col)))
    out = tmp
    for c in ("shingles", "minhash", "bands", "simhash",
              "norm_text", "first_sh", "last_sh"):
        out = out.withColumn(c, F.col(f"__sig.{c}"))
    return out.drop("__sig")
