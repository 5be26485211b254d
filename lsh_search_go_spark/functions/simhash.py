"""SimHash bit signatures + Hamming distance, over k-shingle feature sets.

The vectorized re-realization of the reference's hyperplane sign-bit hashing
(/root/reference/lsh/hasher.go:25-57): the reference sets bit ``depth`` of a
tree path iff the vector is on the negative side of a plane; classic SimHash
(Charikar '02) is the fixed-depth special case where every bit has an
independent "plane".  Here the "planes" over the implicit one-hot shingle
space are pseudo-random sign vectors drawn from the universal hash family
``sign_j(h) = +1 iff (a_j * h + b_j) mod p > (p-1)/2`` — reproducible in
Spark SQL, numpy and DuckDB alike.

Features are the document's DISTINCT k-shingle hashes (binary weights), i.e.
the same feature set MinHash consumes — one shingling pass feeds both
signature families.  The signature is stored as ``array<bigint>`` of 32-bit
words so XOR/bit_count stay in signed-64 territory in every engine.

Hamming verify mirrors the reference's exact-distance candidate check
(/root/reference/lsh/lsh.go:174-190) with Hamming in place of L2/angular.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lsh_search_go_spark.config import (MERSENNE31, POLY_COMBINE_MULT,
                                        DedupConfig)
from lsh_search_go_spark.functions import hashing as H

P = MERSENNE31
HALF = (P - 1) // 2  # 1073741823; sign is + iff uhash > HALF


# ---------------------------------------------------------------------------
# Spark-SQL backend
# ---------------------------------------------------------------------------

def _simhash_bits_sql_str(shingles_col: str, cfg: DedupConfig) -> str:
    """SQL string: array<bigint> shingles → array<bigint>[nbits] of 0/1 bits.

    Params ride as an array-of-structs literal bound by the outer transform
    (see hashing.params_struct_array for why element_at(literal, i) inside the
    inner lambda is catastrophic)."""
    from lsh_search_go_spark.functions.hashing import params_struct_array

    a, b = cfg.simhash_params
    signsum = (
        f"aggregate({shingles_col}, cast(0 as bigint), (s, h) -> s + "
        f"(case when (p.a * h + p.b) % {P} > {HALF} then 1 else -1 end))"
    )
    return (
        f"transform({params_struct_array(a, b)}, p -> "
        f"(case when {signsum} > 0 then cast(1 as bigint) else cast(0 as bigint) end))"
    )


def _pack_bits_sql_str(bits_sql: str, nbits: int) -> str:
    """SQL string: array<bigint>[nbits] of 0/1 → array<bigint>[nbits/32] words,
    LSB-first within each word (word = Σ bit_j << j) — same convention as the
    numpy backend (1 << arange(32)) and the DuckDB mirror."""
    nwords = nbits // 32
    word = (
        f"aggregate(reverse(slice({bits_sql}, w * 32 + 1, 32)), cast(0 as bigint), "
        f"(acc, bit) -> acc * 2 + bit)"
    )
    return f"transform(sequence(0, {nwords - 1}), w -> {word})"


def simhash_words_sql(shingles_col: str, cfg: DedupConfig) -> Column:
    """array<bigint> distinct shingle hashes → array<bigint>[nwords] SimHash."""
    bits = _simhash_bits_sql_str(shingles_col, cfg)
    return F.expr(_pack_bits_sql_str(bits, cfg.simhash_bits))


def hamming_expr(col1: str, col2: str) -> Column:
    """Hamming distance between two word-array signatures (JVM-side)."""
    return F.expr(
        f"aggregate(zip_with({col1}, {col2}, (x, y) -> bit_count(x ^ y)), 0, (s, v) -> s + v)"
    )


# ---------------------------------------------------------------------------
# numpy backend (used inside Arrow-batched pandas UDFs)
# ---------------------------------------------------------------------------

def simhash_np(shingles: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    """(m,) distinct shingle hashes → (nwords,) SimHash words.  Vectorized:
    (nbits × m) sign matrix in one broadcast, bit packing by matmul."""
    a, b = cfg.simhash_params
    an = np.asarray(a, dtype=np.int64)[:, None]
    bn = np.asarray(b, dtype=np.int64)[:, None]
    nwords = cfg.simhash_bits // 32
    if shingles.size == 0:
        return np.zeros(nwords, dtype=np.int64)
    signs = np.where((an * shingles[None, :] + bn) % P > HALF, 1, -1)
    sums = signs.sum(axis=1)  # (nbits,)
    bits = (sums > 0).astype(np.int64)
    weights = 1 << np.arange(32, dtype=np.int64)
    return bits.reshape(nwords, 32) @ weights


def simhash_batch(shingle_lists: pd.Series, cfg: DedupConfig) -> pd.Series:
    """Arrow batch: Series[list[int]] → Series[list[int]] of SimHash words
    (list-of-lists wrapper around :func:`simhash_segments_np`)."""
    ndocs = len(shingle_lists)
    counts = np.fromiter((len(x) for x in shingle_lists), dtype=np.int64, count=ndocs)
    if int(counts.sum()) == 0:
        return pd.Series([[0] * (cfg.simhash_bits // 32)] * ndocs)
    flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in shingle_lists if len(x)])
    return pd.Series(simhash_segments_np(flat, counts, cfg).tolist())


def simhash_segments_np(flat: np.ndarray, counts: np.ndarray,
                        cfg: DedupConfig) -> np.ndarray:
    """SimHash over segment-encoded shingles → (ndocs, nwords) words.
    Tiled segment-sums with np.add.reduceat — no per-document Python."""
    a, b = cfg.simhash_params
    an = np.asarray(a, dtype=np.int64)
    bn = np.asarray(b, dtype=np.int64)
    nbits = cfg.simhash_bits
    nwords = nbits // 32
    ndocs = counts.shape[0]
    total = int(counts.sum())
    if total == 0:
        return np.zeros((ndocs, nwords), dtype=np.int64)
    starts = np.zeros(ndocs, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    # tiled over documents with an L2-resident working set per pass — see
    # hashing._doc_tiles: untiled int64 modular streaming saturates DRAM
    # bandwidth under concurrent executor tasks and kills multi-core scaling.
    bits = np.zeros((nbits, ndocs), dtype=np.int64)
    tmp = np.empty(min(total, H._TILE * 2), dtype=np.int64)
    for dlo, dhi, flo, fhi in H._doc_tiles(counts):
        seg = counts[dlo:dhi]
        mask = seg > 0
        if not mask.any():
            continue
        chunk = flat[flo:fhi]
        local_starts = (starts[dlo:dhi] - flo)[mask]
        t = tmp[: chunk.size] if chunk.size <= tmp.size else np.empty_like(chunk)
        rows = np.arange(dlo, dhi)[mask]
        for j in range(nbits):
            np.multiply(chunk, an[j], out=t)
            t += bn[j]
            t %= P
            signs = np.where(t > HALF, np.int32(1), np.int32(-1))
            sums = np.add.reduceat(signs, local_starts)
            bits[j, rows] = sums > 0
    weights = 1 << np.arange(32, dtype=np.int64)
    return np.einsum("wbd,b->dw", bits.reshape(nwords, 32, ndocs), weights)


def with_simhash(df: DataFrame, cfg: DedupConfig, impl: str = "sql",
                 shingles_col: str = "shingles", out_col: str = "simhash") -> DataFrame:
    if impl == "sql":
        return df.withColumn(out_col, simhash_words_sql(shingles_col, cfg))
    if impl == "pandas":
        @F.pandas_udf(T.ArrayType(T.LongType()))
        def udf(sh: pd.Series) -> pd.Series:
            return simhash_batch(sh, cfg)
        return df.withColumn(out_col, udf(F.col(shingles_col)))
    raise ValueError(f"unknown impl {impl!r}")


# ---------------------------------------------------------------------------
# Banded SimHash LSH (bit-slice buckets)
# ---------------------------------------------------------------------------

def simhash_band_hashes(sim_col: str, cfg: DedupConfig, n_bands: int = 8) -> Column:
    """Split the simhash bit signature into ``n_bands`` contiguous bit slices;
    each slice value is the band hash.  Two signatures within Hamming distance
    h collide on at least one band when h < n_bands (pigeonhole), so
    ``n_bands > hamming_threshold`` guarantees recall 1.0 of the banded
    candidate generation vs brute-force Hamming — the exact-substring analog
    of MinHash banding, over bit space.

    Works on the word-array signature: band j covers bits
    [j*w, (j+1)*w) with w = simhash_bits / n_bands.  Sub-word bands
    (w <= 32, dividing 32) are the raw bit-slice value; multi-word bands
    (w a multiple of 32, e.g. simhash_bits=256 with 4 bands) are folded
    through a polynomial hash mod the Mersenne prime 2^31-1 — the identical
    integer arithmetic runs on Spark and DuckDB with no int64 overflow
    (word < 2^32, acc < 2^31 ⇒ acc·1000003 + word < 2^52), so the engines
    stay bit-identical where a raw multi-word concat (acc·2^32 + word)
    would wrap in Spark and raise in DuckDB (r2 ADVICE / r3 VERDICT task 6).
    Equal slices still hash equal, so the pigeonhole recall guarantee of
    ``n_bands > hamming_threshold`` is unchanged (a fold collision can only
    ADD a candidate, never lose one)."""
    w = _band_width(cfg.simhash_bits, n_bands)
    if w > 32:
        wpw = w // 32                       # words per band
        expr = (
            f"transform(sequence(0, {n_bands - 1}), j -> "
            f"aggregate(slice({sim_col}, j * {wpw} + 1, {wpw}), "
            f"cast(0 as bigint), "
            f"(acc, x) -> (acc * {POLY_COMBINE_MULT} + x) % {MERSENNE31}))"
        )
        return F.expr(expr)
    per_word = 32 // w
    # band j lives in word j//per_word, bit offset (j%per_word)*w
    expr = (
        f"transform(sequence(0, {n_bands - 1}), j -> "
        f"(element_at({sim_col}, cast(j / {per_word} as int) + 1) "
        f">> ((j % {per_word}) * {w})) & {(1 << w) - 1})"
    )
    return F.expr(expr)


def _band_width(nbits: int, n_bands: int) -> int:
    """Validated band width shared by the Spark and DuckDB band helpers.
    Allowed widths: w <= 32 dividing 32 (raw bit-slice band hash), or any
    multiple of 32 (Mersenne-folded multi-word band hash — see
    :func:`simhash_band_hashes`).  Everything else would straddle word
    boundaries and is rejected."""
    if nbits % n_bands != 0:
        raise ValueError("n_bands must divide simhash_bits")
    w = nbits // n_bands
    if w > 32:
        if w % 32 != 0:
            raise ValueError(
                f"band width {w} > 32 bits must be a multiple of 32 "
                "(multi-word Mersenne-folded bands)")
        return w
    if 32 % w != 0:
        raise ValueError("band width must align with 32-bit words")
    return w


def simhash_candidate_pairs(df: DataFrame, cfg: DedupConfig,
                            n_bands: int = 8, id_col: str = "doc_id",
                            sim_col: str = "simhash",
                            max_bucket_size: int | None = None) -> DataFrame:
    """Distinct candidate pairs from simhash bit-slice buckets.  With
    n_bands > hamming_threshold this has recall 1.0 for true Hamming dups."""
    from lsh_search_go_spark.operators.bands import candidate_pairs, explode_bands

    banded = df.withColumn("__sbands", simhash_band_hashes(sim_col, cfg, n_bands))
    buckets = explode_bands(banded, id_col, "__sbands")
    return candidate_pairs(buckets, id_col, max_bucket_size)


# ---------------------------------------------------------------------------
# DuckDB oracle mirror
# ---------------------------------------------------------------------------

def duck_simhash_words(shingles_sql: str, cfg: DedupConfig) -> str:
    a, b = cfg.simhash_params
    a_lit = f"[{','.join(map(str, a))}]"
    b_lit = f"[{','.join(map(str, b))}]"
    bit_idx = "(w * 32 + jj)"
    signsum = (
        f"list_reduce(list_prepend(0::BIGINT, list_transform({shingles_sql}, h -> "
        f"(case when ({a_lit}[{bit_idx} + 1] * h + {b_lit}[{bit_idx} + 1]) % {P} > {HALF} "
        f"then 1 else -1 end)::BIGINT)), (s, v) -> s + v)"
    )
    word = (
        f"list_reduce(list_prepend(0::BIGINT, list_transform(range(32), jj -> "
        f"(case when {signsum} > 0 then (1::BIGINT << jj) else 0::BIGINT end))), "
        f"(x, y) -> x + y)"
    )
    return f"list_transform(range({cfg.simhash_bits // 32}), w -> {word})"


def duck_band_expr(words_sql: str, cfg: DedupConfig, n_bands: int,
                   band_var: str = "j") -> str:
    """DuckDB mirror of :func:`simhash_band_hashes` for one band index
    ``band_var`` (0-based): the band's bit-slice value from the word array
    (or the identical Mersenne fold for multi-word bands)."""
    w = _band_width(cfg.simhash_bits, n_bands)
    if w > 32:
        wpw = w // 32
        return (
            f"list_reduce(list_prepend(0::BIGINT, "
            f"list_slice({words_sql}, {band_var} * {wpw} + 1, "
            f"({band_var} + 1) * {wpw})), "
            f"(acc, x) -> (acc * {POLY_COMBINE_MULT} + x) % {MERSENNE31})"
        )
    per_word = 32 // w
    return (f"({words_sql}[({band_var} // {per_word}) + 1] "
            f">> (({band_var} % {per_word}) * {w})) & {(1 << w) - 1}")


def duck_hamming(col1: str, col2: str, nwords: int) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform(range({nwords}), i -> "
        f"bit_count(xor({col1}[i + 1], {col2}[i + 1]))::BIGINT)), (s, v) -> s + v)"
    )
