"""Frozen configuration dataclasses.

Reference analog: ``lsh.Config`` / ``lsh.HasherConfig``
(/root/reference/lsh/lsh.go:80-92, /root/reference/lsh/hasher.go:59-71).
The reference mutex-guards config reads (lsh/lsh.go:61-78); we freeze instead —
no mutation, no locks, and the config hash keys checkpoint directories.

Determinism: the reference seeds tree growth from the wall clock
(/root/reference/lsh/hasher.go:165) which makes runs non-reproducible; a fixed
``seed`` here is a hard requirement of the target spec (resume + parity tests).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

# Mersenne prime 2^31 - 1: every hash value stays < 2^31 so that products with
# 31-bit multipliers fit comfortably in a signed 64-bit integer in Spark SQL,
# numpy int64 and DuckDB BIGINT alike (no overflow, no unsigned types needed).
MERSENNE31 = 2_147_483_647
# Multiplier for the char-level polynomial rolling hash (Java-style).
POLY_CHAR_MULT = 31
# Multiplier for combining token hashes into shingle hashes / band hashes.
POLY_COMBINE_MULT = 1_000_003


def _rng_params(seed: int, n: int) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Deterministic universal-hash parameters (a_i, b_i), a_i in [1, p-1],
    b_i in [0, p-1].  Generated with a splitmix-style integer mix so the same
    constants are trivially re-derivable anywhere (no numpy dependency here —
    the constants are embedded into SQL strings for the DuckDB oracle)."""
    def mix(x: int) -> int:
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB % (1 << 64)
        return x ^ (x >> 31)

    a, b = [], []
    s = seed * 2 + 1
    for i in range(n):
        a.append(mix(s + 2 * i) % (MERSENNE31 - 1) + 1)
        b.append(mix(s + 2 * i + 1) % MERSENNE31)
    return tuple(a), tuple(b)


@dataclass(frozen=True)
class DedupConfig:
    """Configuration of the near-duplicate pipeline.

    ``num_perm = num_bands * rows_per_band`` (banded MinHash LSH, Broder '97 /
    MMDS ch.3).  ``rows_per_band`` plays the role the reference's ``KMinVecs``
    plays for bucket granularity (/root/reference/lsh/hasher.go:153-160):
    fewer rows per band → coarser buckets → higher recall, more candidates.
    """

    seed: int = 42
    shingle_k: int = 3              # tokens per shingle
    num_perm: int = 128             # MinHash signature length
    num_bands: int = 32             # b
    rows_per_band: int = 4          # r  (b*r must equal num_perm)
    jaccard_threshold: float = 0.7  # inclusive, like the reference's dist<=t (lsh/lsh.go:179)
    simhash_bits: int = 64          # SimHash signature width (stored as 32-bit words)
    hamming_threshold: int = 10     # inclusive max Hamming for SimHash dups
                                    # (J≈0.9 dup → cos≈0.95 → E[ham]≈6.5/64 bits;
                                    #  10 gives margin while unrelated text sits ≈32)
    max_bucket_size: int = 2000     # skew guard: buckets larger than this are dropped+logged
    lowercase: bool = True
    strip_comments: bool = False    # code normalization: drop '#...' line comments
    id_col: str = "doc_id"
    content_col: str = "content"
    pairs_strategy: str = "minhash"  # candidate generator: "minhash" bands or
                                     # "simhash" bit-slice bands (+Hamming verify)
    simhash_bands: int = 16          # bit-slice bands for the simhash strategy;
                                     # > hamming_threshold ⇒ recall 1.0 (pigeonhole)
    verify_surrogate_keys: bool = True  # assert xxhash64 doc_key is collision-free
                                        # per run (64-bit keys are safe to ~10^9 docs;
                                        # swap to 128-bit beyond — see pipeline.py)

    def __post_init__(self) -> None:
        if self.num_bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"num_bands*rows_per_band ({self.num_bands}x{self.rows_per_band}) "
                f"!= num_perm ({self.num_perm})"
            )
        if self.simhash_bits % 32 != 0:
            raise ValueError("simhash_bits must be a multiple of 32")
        if self.pairs_strategy not in ("minhash", "simhash"):
            raise ValueError(f"unknown pairs_strategy {self.pairs_strategy!r}")
        if self.pairs_strategy == "simhash":
            if self.simhash_bands <= self.hamming_threshold:
                raise ValueError(
                    "simhash_bands must exceed hamming_threshold for full recall "
                    f"({self.simhash_bands} <= {self.hamming_threshold})"
                )
            band_bits = self.simhash_bits // self.simhash_bands
            if band_bits < 8:
                # 4-bit bands have a 16-value domain: at corpus scale EVERY
                # bucket overflows max_bucket_size and the cap silently drops
                # all candidates (r2 review finding). 8 bits (256 values) is
                # the floor for small corpora; use simhash_bits=256 with 16
                # bands (16-bit domains) for web-scale runs.
                # Joint constraint (Charikar-style banding): bands >
                # hamming_threshold (pigeonhole recall) AND width >= 8
                # together require simhash_bits >= 8*(hamming_threshold+1) —
                # e.g. Google's 64-bit/4-band/ham<=3 config, or our
                # 128-bit/16-band/ham<=10 default for --pairs-strategy simhash.
                raise ValueError(
                    f"simhash band width {band_bits} bits is too narrow for the "
                    f"banded strategy (domain {1 << band_bits} values — buckets "
                    "overflow at scale); raise simhash_bits so that "
                    "simhash_bits / simhash_bands >= 8"
                )
            if band_bits <= 32 and 32 % band_bits != 0:
                # mirror of simhash._band_width: sub-word bands must pack
                # evenly into 32-bit words or the slice expression would
                # straddle a word boundary — fail at config time, not after
                # the signature stages have already run
                raise ValueError(
                    f"simhash band width {band_bits} bits must divide 32 "
                    f"(got simhash_bits={self.simhash_bits} / "
                    f"simhash_bands={self.simhash_bands})"
                )
            if band_bits > 32 and band_bits % 32 != 0:
                # wide bands are supported as whole-word groups folded
                # through a Mersenne-prime polynomial hash (bit-identical on
                # Spark and DuckDB — simhash.simhash_band_hashes); a width
                # straddling a word boundary is not
                raise ValueError(
                    f"simhash band width {band_bits} > 32 bits must be a "
                    f"multiple of 32 (e.g. simhash_bits={self.simhash_bits} "
                    f"with simhash_bands dividing {self.simhash_bits // 32})"
                )

    # --- derived, deterministic hash-family parameters -------------------
    @property
    def minhash_params(self) -> tuple[tuple[int, ...], tuple[int, ...]]:
        return _rng_params(self.seed, self.num_perm)

    @property
    def simhash_params(self) -> tuple[tuple[int, ...], tuple[int, ...]]:
        return _rng_params(self.seed + 1_000_000, self.simhash_bits)

    @property
    def config_hash(self) -> str:
        """Stable hash keying checkpoint directories (resume contract)."""
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


@dataclass(frozen=True)
class AnnConfig:
    """Configuration of the reference-parity ANN index.

    Mirrors ``lsh.Config``/``HasherConfig`` field-for-field
    (/root/reference/lsh/lsh.go:80-92, /root/reference/lsh/hasher.go:59-71),
    with a fixed seed replacing the reference's wall-clock seeding.
    """

    n_trees: int = 10               # NTrees        (lsh/hasher.go:60)
    k_min_vecs: int = 50            # KMinVecs      (lsh/hasher.go:61) — stop splitting below this
    dims: int = 2                   # Dims          (lsh/hasher.go:62)
    is_angular: bool = False        # isAngularMetric (lsh/hasher.go:63)
    max_depth: int = 62             # bits 0..62 keep the int64 hash non-negative;
                                    # the reference caps depth at 63 in uint64
                                    # (lsh/hasher.go:138) — 63 is allowed here too
                                    # (multiprobe handles the negative-hash case)
    sample_size: int = 10_000       # corpus sample used for plane fitting
    multiprobe: bool = True         # MSB-flip probe expansion (lsh/lsh.go:148-157)
    seed: int = 42
    batch_candidates_cap: int = 100_000  # deterministic analog of MaxCandidates (lsh/lsh.go:145)

    @property
    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


# Numeric tolerance shared with the reference (/root/reference/lsh/helpers.go:13-15).
TOL = 1e-6
