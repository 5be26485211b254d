"""Reference-parity ANN index: a forest of biased random-hyperplane trees.

Re-realizes the reference's exact model semantics, vectorized:

* plane from a sampled point pair — ``center = (p0+p1)/2``, ``n = p1 - center``,
  ``d = <center, n>`` — a *biased* plane not through the origin
  (/root/reference/lsh/hasher.go:86-98);
* the two sampled points are sorted by ascending L2 norm and normalized iff
  the metric is angular (/root/reference/lsh/hasher.go:100-134);
* tree growth splits on the plane sign, recursing into a side only while it
  holds more than ``k_min_vecs`` points, with depth capped at 63 so the bit
  path fits 64 bits (/root/reference/lsh/hasher.go:136-161);
* a vector's per-tree hash is the root-to-leaf bit path: bit at ``depth`` set
  iff strictly on the negative side, then go left (/root/reference/lsh/hasher.go:38-57);
* queries are normalized iff angular (/root/reference/lsh/hasher.go:197-205);
* multiprobe flips the most-significant set bit of each hash
  (/root/reference/lsh/lsh.go:148-157);
* candidates verified with the exact metric, admitted iff dist <= threshold
  (inclusive, /root/reference/lsh/lsh.go:174-190), top-k by window
  (/root/reference/lsh/lsh.go:22-47, 194-198).

Deliberate departures (documented, SURVEY §7.0): fixed seed instead of
wall-clock (/root/reference/lsh/hasher.go:165 is non-reproducible); no
arrival-order-dependent ``maxCandidates`` early exit — Spark can't early-exit
a join; the deterministic skew guard is a per-bucket cap.

Spark shape: the model is fit driver-side on a corpus *sample* (tiny —
numpy), broadcast once; hashing runs as an Arrow-batched pandas UDF doing one
matmul-style traversal step per depth level across the whole batch; buckets
and candidate verification are DataFrame joins.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lsh_search_go_spark.config import TOL, AnnConfig

# Bump whenever fit()/hash_batch() semantics change in a way that alters the
# produced forest or hashes — cache keys for model-derived oracle relations
# include it, so stale cached buckets/probes can never gate a newer model.
# 2: r4 level-synchronous BFS fit + float32 traversal dots.
# 3: r4 whole-level vectorized plane draws (one rng.random batch per level
#    replaces per-node choice(n, 2) — same distribution, different stream).
MODEL_VERSION = 3


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

@dataclass
class FlatTree:
    """One hyperplane tree flattened to arrays for vectorized traversal.
    Node 0 is the root; child index -1 = absent (leaf edge)."""
    normals: np.ndarray          # (n_nodes, dims)
    offsets: np.ndarray          # (n_nodes,)
    left: np.ndarray             # (n_nodes,) int32
    right: np.ndarray            # (n_nodes,) int32
    _f32: tuple | None = None    # lazy (normals32, offsets32) traversal cache

    def f32(self) -> tuple[np.ndarray, np.ndarray]:
        """Cached float32 copies of the planes for the hot traversal path —
        derived from the float64 truth on first use, so a save/load roundtrip
        reproduces identical hashes."""
        if self._f32 is None:
            self._f32 = (np.ascontiguousarray(self.normals, dtype=np.float32),
                         self.offsets.astype(np.float32))
        return self._f32


@dataclass
class HasherModel:
    cfg: AnnConfig
    trees: list[FlatTree] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "cfg": vars(self.cfg).copy() if hasattr(self.cfg, "__dict__") else
                   {k: getattr(self.cfg, k) for k in (
                       "n_trees", "k_min_vecs", "dims", "is_angular", "max_depth",
                       "sample_size", "multiprobe", "seed", "batch_candidates_cap")},
            "trees": [
                {"normals": t.normals.tolist(), "offsets": t.offsets.tolist(),
                 "left": t.left.tolist(), "right": t.right.tolist()}
                for t in self.trees
            ],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "HasherModel":
        cfg = AnnConfig(**d["cfg"])
        trees = [
            FlatTree(np.array(t["normals"], dtype=np.float64),
                     np.array(t["offsets"], dtype=np.float64),
                     np.array(t["left"], dtype=np.int32),
                     np.array(t["right"], dtype=np.int32))
            for t in d["trees"]
        ]
        return cls(cfg, trees)


def _normalize(x: np.ndarray) -> np.ndarray:
    """Normalize rows with the reference's tol guard: leave near-zero vectors
    untouched (/root/reference/lsh/helpers.go:13-15 usage)."""
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    safe = np.where(norms > TOL, norms, 1.0)
    return x / safe


def _plane_from_pair(p0: np.ndarray, p1: np.ndarray) -> tuple[np.ndarray, float]:
    """planeByPoints (/root/reference/lsh/hasher.go:86-98)."""
    center = 0.5 * (p0 + p1)
    n = p1 - center
    d = float(center @ n)
    return n, d


def _grow_tree(vecs64: np.ndarray, vecs32: np.ndarray, cfg: AnnConfig,
               rng: np.random.Generator,
               workspace: tuple | None = None) -> FlatTree:
    """growTree (/root/reference/lsh/hasher.go:136-161), level-synchronous.

    Semantics per node are the reference's exactly: draw two distinct random
    members, build the biased plane through their midpoint, send the strictly
    negative side left, and grow a child only while it holds more than
    ``k_min_vecs`` (and ≥2) points with depth ≤ ``max_depth``.  Two documented
    engineering departures from the r1-r3 recursive builder (forest differs
    bit-wise, distribution identical; recall re-measured in BENCH):

    * nodes are created breadth-first, so the per-tree RNG draws happen in
      level order instead of DFS order — each node still draws a uniformly
      distributed distinct random pair from its own subset (one
      ``rng.random((2, S))`` batch per level + Floyd adjustment, the same
      distribution as per-node ``choice(n, 2, replace=False)`` at a fraction
      of the per-node Python cost);
    * split dots are computed in float32 and only the row-ID permutation is
      physically partitioned: rows are gathered from the shared read-only
      ``vecs32`` in cache-sized chunks for the sign matvec, and the chunk's
      ids are scattered left-forward / right-backward into the sibling id
      buffer (the right run un-reversed in place afterwards, so subset order
      — and therefore the RNG draw stream and the resulting forest — is
      identical to a full row compaction).  Each level therefore streams the
      live rows from DRAM exactly once (the r1-r4 row-buffer compaction
      streamed them three times: split read + compress read + compress
      write) and the per-worker workspace drops from two corpus-sized f32
      buffers to two id vectors + one ~1 MB chunk buffer — which is what
      lets the tree-parallel pool scale past the previous DRAM knee.
      Planes themselves are built and stored in float64 from the original
      rows; only the left/right routing of points lying within f32 eps of a
      random plane could differ from an f64 build, moving leaf occupancy by
      ±O(1) points.
    """
    N = vecs64.shape[0]
    level_normals: list[np.ndarray] = []   # one (n_level_nodes, dims) block per level
    level_offsets: list[np.ndarray] = []
    left: list[int] = []
    right: list[int] = []
    n_nodes = 0
    min_child = max(cfg.k_min_vecs, 1)   # child grows iff side_count > this
    if N >= 2:
        if workspace is None:
            workspace = _fit_workspace(vecs32)
        ids, ids_scratch, chunk_buf = workspace
        chunk = chunk_buf.shape[0]
        ids, ids_scratch = ids[:N], ids_scratch[:N]
        ids[:] = np.arange(N, dtype=np.int64)
        # (parent_node, side 0=left/1=right, start, end) — rows [start, end)
        # of ``ids`` are this pending node's subset, in reference order
        # (regions of dropped siblings leave gaps; children nest in their
        # parent's span so the buffer never overflows)
        pending: list[tuple[int, int, int, int]] = [(-1, 0, 0, N)]
        depth = 0
        while pending and depth <= cfg.max_depth:
            # ---- whole-level vectorized plane draws (one RNG call, one
            # gather, one plane batch — per-NODE Python cost is what
            # dominates deep forests like NTrees=200/KMinVecs=200)
            S = len(pending)
            starts = np.fromiter((p[2] for p in pending), np.int64, S)
            n_subs = np.fromiter((p[3] - p[2] for p in pending), np.int64, S)
            u = rng.random((2, S))
            i = np.minimum((u[0] * n_subs).astype(np.int64), n_subs - 1)
            j = np.minimum((u[1] * (n_subs - 1)).astype(np.int64), n_subs - 2)
            j += (j >= i)                # Floyd: j uniform over the others
            P0 = vecs64[ids[starts + i]]
            P1 = vecs64[ids[starts + j]]
            swap = (np.einsum("sd,sd->s", P0, P0)
                    > np.einsum("sd,sd->s", P1, P1))   # ascending by L2 norm
            P0[swap], P1[swap] = P1[swap], P0[swap].copy()
            if cfg.is_angular:
                P0, P1 = _normalize(P0), _normalize(P1)
            centers = 0.5 * (P0 + P1)
            nvecs = P1 - centers
            ds = np.einsum("sd,sd->s", centers, nvecs)
            nvecs32 = nvecs.astype(np.float32)
            ds32 = ds.astype(np.float32)
            base = n_nodes
            level_normals.append(nvecs)
            level_offsets.append(ds)
            left.extend([-1] * S)
            right.extend([-1] * S)
            for si, (parent, side, _, _) in enumerate(pending):
                if parent >= 0:
                    (left if side == 0 else right)[parent] = base + si
            n_nodes += S
            if depth >= cfg.max_depth:
                break                    # children would exceed max_depth
            # ---- per-segment chunked split + id partition into the sibling
            # id buffer: left ids forward from the region start, right ids
            # backward from the region end (counts unknown until the last
            # chunk), then the surviving right run is un-reversed so subset
            # order matches a stable compaction exactly
            nxt: list[tuple[int, int, int, int]] = []
            for si, (parent, side, s, e) in enumerate(pending):
                seg = ids[s:e]
                nvec, d32 = nvecs32[si], ds32[si]
                lw, rw = s, e
                for cs in range(0, e - s, chunk):
                    sub = seg[cs:cs + chunk]
                    # mode='clip' skips the bounds-checked slow path the
                    # default mode='raise' takes when writing into ``out``
                    # (measured ~1.7× on the gather; ids are in range by
                    # construction)
                    rows = np.take(vecs32, sub, axis=0,
                                   out=chunk_buf[:len(sub)], mode="clip")
                    neg = (rows @ nvec - d32) < 0
                    ls = sub[neg]
                    rs = sub[~neg]
                    ids_scratch[lw:lw + len(ls)] = ls
                    lw += len(ls)
                    ids_scratch[rw - len(rs):rw] = rs[::-1]
                    rw -= len(rs)
                nl, nr = lw - s, e - rw
                if nl > min_child:
                    nxt.append((base + si, 0, s, s + nl))
                if nr > min_child:
                    ids_scratch[rw:e] = ids_scratch[rw:e][::-1]
                    nxt.append((base + si, 1, rw, e))
            ids, ids_scratch = ids_scratch, ids
            pending = nxt
            depth += 1
    if n_nodes == 0:                     # degenerate tiny sample: single node
        level_normals.append(np.zeros((1, vecs64.shape[1])))
        level_offsets.append(np.zeros(1))
        left.append(-1)
        right.append(-1)
    return FlatTree(
        np.ascontiguousarray(np.concatenate(level_normals), dtype=np.float64),
        np.concatenate(level_offsets).astype(np.float64),
        np.array(left, dtype=np.int32),
        np.array(right, dtype=np.int32),
    )


def fit(sample: np.ndarray, cfg: AnnConfig) -> HasherModel:
    """Forest build (/root/reference/lsh/hasher.go:171-188).  Deterministic:
    per-tree rng seeded ``seed + tree_id`` (the reference seeds from the wall
    clock — deliberately not replicated)."""
    vecs = np.asarray(sample, dtype=np.float64)
    if cfg.is_angular:
        vecs = _normalize(vecs)
    vecs32 = np.ascontiguousarray(vecs, dtype=np.float32)

    # trees are mutually independent (per-tree rng seeded seed+t) and the
    # hot ops (matvec, compaction copy) release the GIL — thread across
    # trees.  Width capped at 8: the build is memory-bandwidth-bound (each
    # level streams every live point once) and on the measured single-box
    # DRAM ceiling wider pools ANTI-scale (the f32 refactor halved per-tree
    # bytes, moving the knee from 4 to ~8: 60k×784×10 trees cold measured
    # 13.3/11.4/8.0/6.1/7.7 s at 1/2/4/6/8 workers) — a multi-node cluster
    # fits trees on separate buses and doesn't share this cap.  Each worker
    # owns ONE buffer workspace reused across its trees: fresh per-tree
    # allocations cost more in first-touch page faults than the build itself
    # at 60k×784.
    import os
    from concurrent.futures import ThreadPoolExecutor

    workers = max(1, min(cfg.n_trees, 8, os.cpu_count() or 1))

    def build_range(w: int) -> list[tuple[int, FlatTree]]:
        ws = _fit_workspace(vecs32)
        return [(t, _grow_tree(vecs, vecs32, cfg,
                               np.random.default_rng(cfg.seed + t), ws))
                for t in range(w, cfg.n_trees, workers)]

    if workers == 1:
        built = build_range(0)
    else:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            built = [p for chunk in ex.map(build_range, range(workers))
                     for p in chunk]
    trees = [tree for _, tree in sorted(built)]
    return HasherModel(cfg, trees)


def _fit_workspace(vecs32: np.ndarray) -> tuple:
    """One reusable (ids, ids_scratch, chunk_buf) set for tree growth.
    ``chunk_buf`` bounds one gathered row chunk — the rows themselves are
    read straight from the shared ``vecs32``, never copied wholesale (r5:
    the r1-r4 corpus-sized buf/scratch pair is gone).  ~16 MB chunks
    measured fastest for the gather+gemv pass (the gather's per-row copy
    cost dominates, so amortizing the take call wins over strict
    L2-residency: 36 ms vs 49 ms per 60k×784 pass at 1 MB chunks)."""
    n, dims = vecs32.shape
    chunk = max(64, min(16384, (1 << 24) // max(4 * dims, 1)))
    return (np.empty(n, dtype=np.int64),
            np.empty(n, dtype=np.int64),
            np.empty((min(chunk, max(n, 16)), dims), dtype=np.float32))


def fit_from_df(df: DataFrame, cfg: AnnConfig, vec_col: str = "vec",
                order_col: str | None = None) -> HasherModel:
    """Sample the corpus to the driver and fit — the one small collect of the
    build path (mirrors Train's in-memory model fit, /root/reference/lsh/lsh.go:113).

    ``order_col``: when given, the fit sample is the first ``sample_size``
    rows ordered by that column — fully deterministic and reproducible
    *outside Spark* (the DuckDB/numpy oracle re-derives the identical model
    by sorting the same parquet).  Default (None) keeps Spark's seeded
    Bernoulli sample, which is deterministic per Spark version but not
    re-derivable engine-independently."""
    if order_col is not None:
        sdf = df.orderBy(order_col).limit(cfg.sample_size).select(vec_col)
    else:
        n = df.count()
        frac = min(1.0, cfg.sample_size / max(n, 1))
        if frac >= 1.0:                # full-corpus fit: sampler is a no-op
            sdf = df.select(vec_col)
        else:
            sdf = (df.sample(withReplacement=False, fraction=frac,
                             seed=cfg.seed).select(vec_col))
    return fit(collect_vec_matrix(sdf), cfg)


def collect_vec_matrix(sdf: DataFrame) -> np.ndarray:
    """Collect a single vector column to a (n, dims) float64 matrix through
    ONE Arrow transfer: the list column's values buffer is viewed flat and
    reshaped, skipping the per-row ``np.asarray`` loop a pandas collect needs
    (~5 s for 60k×784).  Falls back to the row-wise path for ragged rows or
    nulls (where a flat reshape would misalign)."""
    col_name = sdf.columns[0]
    try:
        col = sdf.toArrow().column(0).combine_chunks()
        if col.null_count == 0 and len(col):
            widths = np.diff(np.asarray(col.offsets))
            if (widths == widths[0]).all():        # truly rectangular
                flat = np.asarray(col.flatten(), dtype=np.float64)
                return flat.reshape(len(col), int(widths[0]))
    except Exception:
        pass
    pdf = sdf.toPandas()
    return np.array([np.asarray(v, dtype=np.float64) for v in pdf[col_name]])


# ---------------------------------------------------------------------------
# Vectorized hashing (traverse, /root/reference/lsh/hasher.go:38-57)
# ---------------------------------------------------------------------------

@dataclass
class TraversalTables:
    """Slim, picklable serving payload: ONLY what hash traversal needs —
    f32 planes + child indices.  The full :class:`HasherModel` carries the
    f64 truth too, which at SIFT/NYT forest sizes is 0.4-1.8 GB; every
    executor python worker unpickles the broadcast once, so shipping these
    tables instead cuts broadcast bytes and per-worker resident memory ~3×
    while producing bit-identical hashes (traversal only ever reads f32)."""
    is_angular: bool
    max_depth: int
    trees: list   # of (normals32, offsets32, left, right)


def traversal_tables(model: HasherModel) -> TraversalTables:
    return TraversalTables(
        model.cfg.is_angular, model.cfg.max_depth,
        [(*t.f32(), t.left, t.right) for t in model.trees])


def hash_batch(X: np.ndarray, model: HasherModel) -> np.ndarray:
    """(B, dims) → (B, n_trees) int64 bit-path hashes, whole batch at once.

    Traversal dots run in float32 against the cached f32 planes
    (:meth:`FlatTree.f32`) — the fit's split dots use the identical precision,
    and every caller (bucket build, driver query hashing, the numpy oracle)
    goes through this one code path, so train/serve/oracle routing is
    consistent by construction."""
    return hash_batch_tables(X, traversal_tables(model))


def hash_batch_tables(X: np.ndarray, tables: TraversalTables,
                      workers: int = 1,
                      chunk_rows: int | None = None) -> np.ndarray:
    """Traversal core over :class:`TraversalTables` (what executors receive).
    While every row of a chunk is still live the einsum reads it in place
    (no row gather); once rows start parking in leaves only the live subset
    is gathered.

    ``workers``: trees are independent, so a driver-side whole-corpus hash
    (:func:`build_buckets_driver`) can thread across them.  Threading ONLY
    pays with large ``chunk_rows``: at the default executor chunk (~167
    rows at 784 dims) the per-op numpy spans are too short to release the
    GIL usefully and an 8-thread pool measured 3× SLOWER than serial;
    chunk 8192 × 8 threads measured 1.9 s vs 4.6 s serial on 60k×784×10.
    Executor contexts keep workers=1 / default chunk — 32 concurrent tasks
    already saturate the cores and share one L3."""
    X = np.asarray(X, dtype=np.float64)
    if tables.is_angular:
        X = _normalize(X)
    X32 = np.ascontiguousarray(X, dtype=np.float32)
    B = X32.shape[0]
    out = np.zeros((B, len(tables.trees)), dtype=np.int64)
    # Row chunking keeps one chunk's (rows + gathered planes) working set in
    # per-core cache: with 32 concurrent executor workers sharing one L3, a
    # whole-batch gather per level thrashes and the stage goes DRAM-bound.
    chunk = chunk_rows or max(1, (1 << 19) // max(4 * X32.shape[1], 1))

    def one_tree(t_idx: int) -> None:
        normals32, offsets32, left, right = tables.trees[t_idx]
        h = np.zeros(B, dtype=np.int64)     # contiguous per-tree column
        for s in range(0, B, chunk):
            Xa = X32[s:s + chunk]
            A = Xa.shape[0]
            cur = np.zeros(A, dtype=np.int32)   # all start at root
            hh = h[s:s + chunk]
            act = np.arange(A)                  # rows still traversing
            depth = 0
            while act.size and depth <= tables.max_depth:
                idx = cur[act]
                G = normals32[idx]              # (A', dims) plane gather
                Xc = Xa if act.size == A else Xa[act]
                neg = np.einsum("ad,ad->a", Xc, G) - offsets32[idx] < 0
                ha = hh[act]
                ha[neg] |= np.int64(1) << np.int64(depth)
                hh[act] = ha
                nxt = np.where(neg, left[idx], right[idx])
                cur[act] = nxt
                act = act[nxt >= 0]
                depth += 1
        out[:, t_idx] = h

    if workers > 1 and len(tables.trees) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(one_tree, range(len(tables.trees))))
    else:
        for t_idx in range(len(tables.trees)):
            one_tree(t_idx)
    return out


def exploded_tree_hashes(df: DataFrame, model: HasherModel,
                         vec_col: str = "vec",
                         keep_cols: tuple[str, ...] = ("id",)) -> DataFrame:
    """(keep_cols..., vec) → exploded (keep_cols..., tree_id int, hash long).

    ONE ``mapInArrow`` pass emits the exploded rows directly (getHashes
    analog, /root/reference/lsh/hasher.go:190-219, minus its mutex-serialized
    pseudo-parallelism which we note and do not replicate).  Emitting the
    exploded relation from inside the UDF — instead of a ``posexplode`` over
    a pandas-UDF array column — is deliberate: Spark plans the latter as
    stacked ``ArrowEvalPython`` nodes that evaluate the hash UDF twice per
    row (r1 PLANS.md finding); this shape evaluates it exactly once and the
    output rows are already narrow (ids + two ints, no vectors).

    Arrow-native (r6): the vector column converts to the (B, dims) matrix by
    one flat-buffer reshape and the output batch is assembled from numpy
    arrays + type-preserving takes — the former mapInPandas pass materialized
    one ndarray object per row on the way in and re-boxed every output cell
    on the way out, which at 10^6 corpus rows cost ~5× the traversal math
    itself (guide §4.2)."""
    import pyarrow as pa

    from lsh_search_go_spark.functions import arrowmat as AM

    spark = df.sparkSession
    # broadcast the slim TRAVERSAL TABLES, not the model: numpy arrays
    # pickle as raw buffers (a to_dict() broadcast made every task re-parse
    # ~n_trees·nodes·dims Python floats, which dominated the whole stage),
    # and dropping the f64 planes cuts the payload ~3× — at NYT scale
    # (200 trees × 256d) the full model is ~1.8 GB × one copy per python
    # worker
    bc = spark.sparkContext.broadcast(traversal_tables(model))
    n_trees = len(model.trees)
    in_df = df.select(*keep_cols, vec_col)
    # Degenerate-layout guard (guide §2.5): a single-row-group parquet corpus
    # feeds every Arrow batch to ONE python worker — the 1M×64 bucket build
    # measured 13-16 s with the traversal kernel itself at 1.3 s across 32
    # processes.  Hashing costs ~12 μs/row serial vs ~5 μs/row to shuffle a
    # 512-byte row once, so rebalancing pays whenever the layout is skewed.
    from lsh_search_go_spark.functions.layout import maybe_rebalance

    in_df = maybe_rebalance(in_df, key_col=keep_cols[0] if keep_cols else None)
    schema = T.StructType(
        [in_df.schema[c] for c in keep_cols]
        + [T.StructField("tree_id", T.IntegerType(), False),
           T.StructField("hash", T.LongType(), False)]
    )
    names = [*keep_cols, "tree_id", "hash"]

    def gen(batches):
        tables = bc.value
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            X = AM.matrix_from_column(AM.batch_column(batch, vec_col))
            hashes = hash_batch_tables(X, tables)  # (B, n_trees)
            rep = np.repeat(np.arange(n, dtype=np.int64), n_trees)
            arrays = [AM.take(AM.batch_column(batch, c), rep)
                      for c in keep_cols]
            arrays.append(pa.array(np.tile(np.arange(n_trees, dtype=np.int32), n)))
            arrays.append(pa.array(hashes.reshape(-1)))
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return in_df.mapInArrow(gen, schema)


# ---------------------------------------------------------------------------
# Index build + search (Train/Search, /root/reference/lsh/lsh.go:107-199)
# ---------------------------------------------------------------------------

def save_model(model: HasherModel, path: str) -> None:
    """DumpHasher analog (/root/reference/lsh/hasher.go:221-251, lsh/lsh.go:201-209):
    JSON instead of gob; part of the checkpoint/resume contract."""
    import json
    import os

    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = model.to_dict()
    # provenance only — a loaded model is self-contained (hashes derive from
    # the stored planes, never a refit), so load_model needs no version gate
    payload["model_version"] = MODEL_VERSION
    payload["fingerprint"] = model_fingerprint(model)
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def load_model(path: str) -> HasherModel:
    import json

    with open(path) as f:
        return HasherModel.from_dict(json.load(f))


def build_buckets(df: DataFrame, model: HasherModel, id_col: str = "id",
                  vec_col: str = "vec") -> DataFrame:
    """(id, vec) → buckets(tree_id int, hash bigint, id) — SetHash analog
    (/root/reference/store/kv/store.go:64-73) as one exploded-hash pass."""
    return exploded_tree_hashes(df, model, vec_col, (id_col,)).select(
        id_col, "tree_id", "hash"
    )


def collect_id_vec_matrix(df: DataFrame, id_col: str = "id",
                          vec_col: str = "vec") -> tuple[np.ndarray, np.ndarray]:
    """(ids, (n, dims) float64 matrix) through ONE Arrow transfer — the
    two-column sibling of :func:`collect_vec_matrix`, for callers that need
    the ids too (e.g. a driver-side bucket build reusing the fit's corpus).
    Same flat-reshape fast path; row order is the DataFrame's scan order,
    identical for both columns (one collect)."""
    sdf = df.select(id_col, vec_col)
    try:
        tbl = sdf.toArrow()
        ids = tbl.column(0).to_numpy(zero_copy_only=False)
        col = tbl.column(1).combine_chunks()
        if col.null_count == 0 and len(col):
            widths = np.diff(np.asarray(col.offsets))
            if (widths == widths[0]).all():
                flat = np.asarray(col.flatten(), dtype=np.float64)
                return ids, flat.reshape(len(col), int(widths[0]))
    except Exception:
        pass
    pdf = sdf.toPandas()
    return (pdf[id_col].to_numpy(),
            np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]))


def build_buckets_driver(spark, ids: np.ndarray, X: np.ndarray,
                         model: HasherModel, id_col: str = "id",
                         id_type: str = "bigint",
                         workers: int = 8) -> DataFrame:
    """Driver-side bucket build for a corpus whose matrix is ALREADY driver
    resident — the reference's own Train regime (its whole index build is
    one in-memory process, /root/reference/lsh/lsh.go:107-136).

    Bit-identical to :func:`build_buckets` (same :func:`hash_batch_tables`
    traversal), different physique: the distributed build ships the corpus
    to the python workers AND a broadcast of the traversal tables to every
    worker — at NYT scale the forest alone is ~0.6 GB × n_workers of
    unpickling — whereas a full-corpus fit (``sample_size >= corpus``)
    already paid the one Arrow collect, so hashing where the matrix lives
    costs one tree-parallel traversal plus one Arrow upload of the narrow
    (id, tree_id, hash) relation.  Use the distributed
    :func:`build_buckets` whenever the corpus does NOT fit the driver —
    that path is the 100 TB shape and stays the default everywhere else."""
    hashes = hash_batch_tables(
        np.asarray(X, dtype=np.float64), traversal_tables(model),
        workers=workers, chunk_rows=8192)
    n, n_trees = hashes.shape
    ids = np.asarray(ids)
    pdf = pd.DataFrame({
        id_col: np.repeat(ids, n_trees),
        "tree_id": np.tile(np.arange(n_trees, dtype=np.int32), n),
        "hash": hashes.reshape(-1),
    })
    return spark.createDataFrame(
        pdf, schema=f"{id_col} {id_type}, tree_id int, hash long")


# ---------------------------------------------------------------------------
# Partition-pruned bucket store (the serving read path at 100 TB)
# ---------------------------------------------------------------------------
#
# The reference's search is fast because its store is a hash map: a query
# reads ~2·n_trees buckets and never touches the rest of the corpus
# (/root/reference/store/kv/store.go:75-94).  The Spark-native equivalent of
# that O(1) bucket access is STORAGE partition pruning: the bucket relation
# is written partitioned by (tree_id, hash_pfx = pmod(hash, P)), and because
# query hashing is driver-side, the probe keys are known BEFORE the scan —
# the filter (tree_id, hash_pfx) ∈ probes reaches the file listing and a
# small query batch reads only its probed partitions instead of the whole
# bucket table.  Coverage fraction ≈ min(1, n_probes / (n_trees · P)).

def model_fingerprint(model: HasherModel) -> str:
    """Stable content hash of the SERVING truth (f32 planes + children +
    config).  Persisted into a bucket store's ``_store_meta`` and checked by
    :func:`search_from_store`: a store only answers correctly for queries
    hashed by the exact forest that built it, and a same-config refit no
    longer reproduces the forest across MODEL_VERSIONs — without this check
    a stale store would silently collapse recall to ~0 instead of erroring."""
    import hashlib

    h = hashlib.sha256(model.cfg.config_hash.encode())
    for t in model.trees:
        n32, o32 = t.f32()
        for arr in (n32, o32, t.left, t.right):
            h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()[:32]


def write_bucket_store(buckets: DataFrame, path: str,
                       hash_partitions: int = 64,
                       model: HasherModel | None = None) -> None:
    """Materialize the bucket relation partitioned for probe-side pruning.
    ``hash_partitions`` is persisted in the ``_store_meta`` sub-dataset — the
    reader derives partition keys from it, so a mismatch can never silently
    select the wrong directories (probes whose pfx falls in a non-existent
    dir would just miss their buckets, degrading recall without an error).
    Pass the ``model`` whose :func:`build_buckets` produced ``buckets`` and
    its :func:`model_fingerprint` rides in the meta too, letting
    :func:`search_from_store` REFUSE a probe model that differs from the
    build model instead of silently missing every bucket.

    The meta rides as a one-row JSON dataset written THROUGH Spark (not
    local ``open()``), so the store works unchanged on HDFS/S3/GCS paths
    (r2 ADVICE).  The leading underscore keeps Hadoop's hidden-path filter
    from surfacing it in the parquet scan, and ``mode("overwrite")`` on both
    writes — with ``partitionOverwriteMode`` pinned to ``static`` so a
    session-level ``dynamic`` default can't turn the overwrite into a
    per-touched-directory one (r3 ADVICE: a dynamic re-layout to a smaller
    modulus would leave stale ``hash_pfx`` dirs whose values still satisfy
    the new combined-key pruning) — means a re-layout can never leave a
    stale modulus behind."""
    spark = buckets.sparkSession
    (buckets
     .withColumn("hash_pfx", F.pmod(F.col("hash"), F.lit(hash_partitions)))
     .repartition("tree_id", "hash_pfx")       # one file per partition dir
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "static")
     .partitionBy("tree_id", "hash_pfx")
     .parquet(path))
    fp = model_fingerprint(model) if model is not None else None
    (spark.createDataFrame(
        [(int(hash_partitions), fp)],
        "hash_partitions int, model_fingerprint string")
     .coalesce(1).write.mode("overwrite").json(_meta_path(path)))


def _meta_path(path: str) -> str:
    return path.rstrip("/") + "/_store_meta"


def _store_meta(spark, path: str) -> tuple[int, str | None]:
    row = spark.read.json(_meta_path(path)).head()
    fp = None
    try:
        fp = row["model_fingerprint"]      # absent in pre-r4 stores
    except Exception:
        pass
    return int(row["hash_partitions"]), fp


def search_from_store(queries: DataFrame, store_path: str, corpus: DataFrame,
                      model: HasherModel, k: int, max_dist: float,
                      metric: str = "l2",
                      id_col: str = "id", vec_col: str = "vec",
                      query_id_col: str = "query_id", query_vec_col: str = "vec",
                      dist_impl: str = "sql",
                      max_candidates: int | None = None) -> DataFrame:
    """Search against a :func:`write_bucket_store` layout.  Identical results
    to :func:`search`; the difference is physical — the partition-pruning
    predicate derived from the driver-hashed probes means only the probed
    (tree_id, hash_pfx) directories are listed and scanned.  The partition
    modulus comes from the store's own ``_store_meta`` JSON sub-dataset;
    when the store carries a model fingerprint, a probe ``model`` that is
    not the store's build model is REFUSED (stores written before
    fingerprinting are accepted as-is)."""
    spark = queries.sparkSession
    hash_partitions, store_fp = _store_meta(spark, store_path)
    if store_fp is None:
        # r4 ADVICE (medium): a pre-fingerprint store is accepted as-is, but
        # hash_batch's traversal precision changed at MODEL_VERSION 2 (f64 →
        # f32 dots), so a store built by an older engine probed by this one
        # can silently lose eps-borderline vectors — exactly the drift the
        # fingerprint guard exists to catch.  Make the blind spot loud.
        import warnings

        warnings.warn(
            f"bucket store at {store_path!r} carries no model fingerprint "
            "(written before fingerprinting, MODEL_VERSION < 2): the probe "
            "model cannot be checked against the forest that built the "
            "store, and traversal-precision changes since then mean hashes "
            "may have drifted for eps-borderline vectors — a silent, "
            "undetectable recall loss. Rebuild the store with "
            "write_bucket_store(..., model=...) to restore the guard.",
            stacklevel=2)
    else:
        caller_fp = model_fingerprint(model)
        if caller_fp != store_fp:
            raise ValueError(
                f"model mismatch: store at {store_path!r} was built with "
                f"forest {store_fp} but the probe model is {caller_fp} — "
                "probing with a different forest silently misses every "
                "bucket (a same-config refit does NOT reproduce the forest "
                "across MODEL_VERSIONs); rebuild the store or load the "
                "original model (save_model/load_model)")
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(query_vec_col).alias("__qvec"))
    collected = _collect_queries(q)
    q_ids, Q = collected
    probe_arrays = driver_probe_arrays(Q, model, len(q_ids))
    _, trees, flat = probe_arrays
    probed = sorted({(int(t), int(h) % hash_partitions)
                     for t, h in zip(trees, flat)})
    store = spark.read.parquet(store_path)
    if probed:
        # EXACT pruning at any probe count: one isin over the combined key
        # tree_id * P + hash_pfx — an expression of partition columns only,
        # so it is evaluated against the directory values during file
        # listing (PartitionFilters) and selects exactly the probed
        # directories, never a cartesian superset (r2 VERDICT task 6).
        combined = F.col("tree_id") * F.lit(hash_partitions) + F.col("hash_pfx")
        pred = combined.isin([t * hash_partitions + p for t, p in probed])
        store = store.filter(pred)            # reaches the partition listing
    buckets = store.select(id_col, "tree_id", "hash")
    cands = candidate_pairs(q, buckets, model, id_col=id_col,
                            max_candidates=max_candidates,
                            _collected=collected,
                            _probe_arrays=probe_arrays)
    return verify_topk(q, cands, corpus, k, max_dist, metric,
                       id_col=id_col, vec_col=vec_col, dist_impl=dist_impl,
                       collected=collected)


def _msb_flip_expr(hash_col: str) -> str:
    """Multiprobe neighbor hash (/root/reference/lsh/lsh.go:148-153):
    pos = floor(log2(hash)) for hash > 0 else 0; neighbor = hash ^ (1<<pos).

    The MSB position is computed INTEGER-exactly as ``length(bin(h)) - 1``
    (never via float log2, whose rounding near exact powers of two differs
    between engines).  This single expression also covers the edge cases:
    h == 0 → bin='0' → pos 0 (reference semantics), and h < 0 (bit 63 set,
    only reachable at max_depth 63; the reference stores uint64) → bin is the
    64-char two's-complement string → pos 63, i.e. the true MSB (r1 ADVICE;
    the default max_depth of 62 keeps hashes non-negative)."""
    pos = f"(length(bin({hash_col})) - 1)"
    return f"cast({hash_col} ^ shiftleft(cast(1 as bigint), {pos}) as bigint)"


def msb_flip_np(h: np.ndarray) -> np.ndarray:
    """Integer-exact mirror of :func:`_msb_flip_expr` (used by the DuckDB
    oracle's probe-expansion materialization — tiny arrays, exactness over
    vectorization)."""
    h = np.asarray(h, dtype=np.int64)
    pos = np.array(
        [int(x).bit_length() - 1 if x > 0 else (63 if x < 0 else 0) for x in h],
        dtype=np.int64,
    )
    return h ^ (np.int64(1) << pos)


def search(queries: DataFrame, buckets: DataFrame, corpus: DataFrame,
           model: HasherModel, k: int, max_dist: float,
           metric: str = "l2",
           id_col: str = "id", vec_col: str = "vec",
           query_id_col: str = "query_id", query_vec_col: str = "vec",
           dist_impl: str = "sql",
           max_candidates: int | None = None,
           broadcast_probes: bool = True,
           hash_queries_on_driver: bool | None = None) -> DataFrame:
    """Batch search: hash queries → (multiprobe) probe expansion → bucket
    join → pair dedup → [deterministic candidate cap] → exact verify →
    inclusive threshold → top-k.

    ``dist_impl``: "sql" (JVM fold — bit-identical to the DuckDB oracle),
    "pandas" (Arrow/numpy pairwise UDF), or "matmul" (broadcast query matrix
    + vectorized gather per corpus batch — the benchmark path; candidate rows
    ship only the corpus vector).

    ``max_candidates``: deterministic per-query cap, ordered by
    ``(first_tree, neighbor_id)`` — keeps the candidates the reference's
    arrival-order early exit keeps (tree 0's buckets are drained first,
    /root/reference/lsh/lsh.go:145,163-166) while staying reproducible
    (residual arrival-order non-determinism documented in SURVEY §7.0 and
    not replicated).

    Physical-plan contract (the 100 TB shape, r1 VERDICT fixes):
    * ONE hash-UDF evaluation per side (``exploded_tree_hashes`` emits
      exploded rows directly — no posexplode over a UDF column);
    * the probe relation (n_queries × trees × probes rows of three scalars)
      is **broadcast** into the bucket join — the big corpus bucket relation
      is never shuffled for a query batch;
    * query vectors do NOT ride the candidate joins: pairs are deduped as
      bare (query_id, neighbor_id) ids, then the (small, broadcast) query
      relation is re-joined by query_id — shuffles move 8-byte ids, not
      512-byte vectors;
    * the deduped candidate set is broadcast into the corpus verify join, so
      the corpus is probed hash-side rather than shuffled.
    Set ``broadcast_probes=False`` for huge query batches where the probe /
    candidate relations stop fitting in a broadcast (falls back to shuffle
    joins; same results).  ``hash_queries_on_driver`` defaults to FOLLOW
    ``broadcast_probes`` (r2 ADVICE): declaring the batch too big to
    broadcast also means it is too big to collect to the driver, so the
    huge-batch escape hatch keeps hashing distributed too — pass an explicit
    True/False to decouple them.  ``dist_impl="matmul"`` still collects the
    query matrix regardless (that is its definition; don't pair it with
    driver-hostile batch sizes).

    Returns (query_id, rank, neighbor_id, dist).
    """
    if hash_queries_on_driver is None:
        hash_queries_on_driver = broadcast_probes
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(query_vec_col).alias("__qvec"))
    collected = None
    if hash_queries_on_driver or dist_impl == "matmul":
        collected = _collect_queries(q)   # ONE driver round-trip, shared by
                                          # probe hashing and matmul verify
    cands = candidate_pairs(q, buckets, model, id_col=id_col,
                            max_candidates=max_candidates,
                            broadcast_probes=broadcast_probes,
                            hash_queries_on_driver=hash_queries_on_driver,
                            _collected=collected)
    return verify_topk(q, cands, corpus, k, max_dist, metric,
                       id_col=id_col, vec_col=vec_col, dist_impl=dist_impl,
                       broadcast_small=broadcast_probes, collected=collected)


def verify_topk(q: DataFrame, cands: DataFrame, corpus: DataFrame,
                k: int, max_dist: float, metric: str = "l2",
                id_col: str = "id", vec_col: str = "vec",
                dist_impl: str = "sql",
                broadcast_small: bool = True,
                collected: tuple[list, np.ndarray] | None = None) -> DataFrame:
    """Exact-verify + inclusive threshold + top-k over a candidate relation
    (Q5-Q6, /root/reference/lsh/lsh.go:174-198) — shared by the LSH-forest
    and IVF read paths.  ``q`` is (query_id, __qvec); ``cands`` is
    (query_id, neighbor_id)."""
    from lsh_search_go_spark.functions.vector import (cosine_dist_expr, dist_udf,
                                                      l2_dist_expr)
    from lsh_search_go_spark.operators.topk import topk_per_query

    maybe_bc = F.broadcast if broadcast_small else (lambda df: df)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    if dist_impl == "matmul_grouped" and collected is not None \
            and len(collected[0]) >= 256:
        # Degenerate-layout guard (guide §2.5) on the verify's stream side:
        # the broadcast join preserves the corpus partitioning, so a
        # single-row-group corpus runs the whole gram on one core (measured
        # 10-16 s for the 1000-query 60k×784 leg vs ~1.5 s spread).  Gated
        # on batch size like the brute-force scan: the gram costs ~2·nq·d
        # flops per touched row vs 8·d shuffled bytes per corpus row once.
        from lsh_search_go_spark.functions.layout import maybe_rebalance

        c = maybe_rebalance(c, key_col="neighbor_id")
    if dist_impl == "matmul_grouped":
        # Wide-vector / big-query-batch verify: candidates are grouped per
        # corpus row BEFORE the join, so each corpus vector crosses the
        # Arrow boundary exactly ONCE (the pairwise paths ship it once per
        # candidate pair — at 784 dims × thousands of pairs per query that
        # is tens of GB of duplicated vector traffic); distances come from
        # one BLAS gram matrix per batch + a pair gather.  Same tol-guard
        # edge semantics as the other backends.
        grouped = cands.groupBy("neighbor_id").agg(
            F.collect_list("query_id").alias("__qids"))
        scored = _matmul_verify_grouped(
            q, c.join(maybe_bc(grouped), "neighbor_id"), metric,
            collected=collected)
    elif dist_impl == "matmul":
        # Benchmark-scale verify: the query MATRIX is broadcast once; each
        # candidate row ships only its corpus vector and the distances come
        # from one vectorized gather per Arrow batch — halves the Arrow
        # traffic of the pairwise UDF (no per-pair __qvec copies) and removes
        # per-pair Python.  Same edge semantics as dist_udf (tol guards).
        # (A degenerate corpus layout runs this verify single-task, but the
        # kernel is ~0.2 s serial at 400k candidate pairs — an interleaved
        # A/B showed no measurable win from batch-threading it, so the
        # search path stays probe-free.)
        scored = _matmul_verify(q, c.join(maybe_bc(cands), "neighbor_id"), metric,
                                collected=collected)
    else:
        joined = (
            c.join(maybe_bc(cands), "neighbor_id")      # corpus stays in place
            .join(maybe_bc(q), "query_id")              # vectors re-joined late
        )
        if dist_impl == "pandas":
            scored = joined.withColumn("dist", dist_udf(metric)(F.col("__cvec"),
                                                                F.col("__qvec")))
        else:
            dist_expr = cosine_dist_expr if metric == "cosine" else l2_dist_expr
            scored = joined.withColumn("dist", dist_expr("__cvec", "__qvec"))
        scored = scored.select("query_id", "neighbor_id", "dist")
    scored = scored.filter(F.col("dist") <= max_dist)    # inclusive (lsh/lsh.go:179)
    return topk_per_query(scored, k).select("query_id", "rank", "neighbor_id", "dist")


def _collect_queries(q: DataFrame) -> tuple[list, np.ndarray]:
    """(query_id, __qvec) relation → (ids, matrix) on the driver."""
    qrows = q.collect()
    q_ids = [r[0] for r in qrows]
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    return q_ids, Q


def driver_probe_arrays(Q: np.ndarray, model: HasherModel,
                        n_queries: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The ONE definition of the driver-side probe set: (query_row_idx,
    tree_id, hash) arrays incl. the multiprobe MSB-flip expansion.  Both the
    probes relation (candidate_pairs) and the store partition-pruning set
    (search_from_store) derive from this — the probe scheme must never exist
    in two copies (a divergent pruning copy would silently exclude the
    directories holding new probes' buckets)."""
    hashes = hash_batch(Q, model) if n_queries else np.zeros((0, len(model.trees)),
                                                             np.int64)
    n_trees = hashes.shape[1]
    ids_rep = np.repeat(np.arange(n_queries), n_trees)
    trees = np.tile(np.arange(n_trees), n_queries)
    flat = hashes.reshape(-1)
    if model.cfg.multiprobe:
        ids_rep = np.concatenate([ids_rep, ids_rep])
        trees = np.concatenate([trees, trees])
        flat = np.concatenate([flat, msb_flip_np(flat)])
    return ids_rep, trees, flat


def candidate_pairs(q: DataFrame, buckets: DataFrame, model: HasherModel,
                    id_col: str = "id",
                    max_candidates: int | None = None,
                    broadcast_probes: bool = True,
                    hash_queries_on_driver: bool = True,
                    _collected: tuple[list, np.ndarray] | None = None,
                    _probe_arrays=None) -> DataFrame:
    """Candidate generation: q(query_id, __qvec) × buckets → deduped
    (query_id, neighbor_id) pairs (Q1-Q4, /root/reference/lsh/lsh.go:140-172).
    Public so benchmarks/metrics can count the pruned candidate set.
    ``_collected``: pre-collected (ids, matrix) from :func:`_collect_queries`
    so ``search`` pays one driver round-trip, not two."""
    maybe_bc = F.broadcast if broadcast_probes else (lambda df: df)
    if hash_queries_on_driver:
        # the model lives on the driver and the query batch is small by
        # contract: hashing locally mirrors the reference's client-side
        # getHashes (/root/reference/lsh/lsh.go:141) and saves two Spark
        # jobs + a Python-worker spin-up per search.
        spark = q.sparkSession
        q_ids, Q = _collected if _collected is not None else _collect_queries(q)
        if _probe_arrays is not None:
            ids_rep, trees, flat = _probe_arrays
        else:
            ids_rep, trees, flat = driver_probe_arrays(Q, model, len(q_ids))
        qtype = dict(q.dtypes)["query_id"]
        # Arrow path: one pandas frame instead of a Python list-of-tuples —
        # mid-size batches (10k-100k queries × trees × 2 probes) otherwise
        # pay per-row Py4J serialization (r3 ADVICE)
        # 1-D object array built element-wise: np.asarray would flatten
        # tuple-like ids (pyspark Row) into a 2-D array
        id_arr = np.empty(len(q_ids), dtype=object)
        id_arr[:] = q_ids
        probes = spark.createDataFrame(
            pd.DataFrame({
                "query_id": id_arr[ids_rep],
                "tree_id": trees.astype(np.int32),
                "hash": flat,
            }),
            schema=f"query_id {qtype}, tree_id int, hash long",
        )
    else:
        probes = exploded_tree_hashes(q, model, "__qvec", ("query_id",))
        if model.cfg.multiprobe:
            probes = probes.withColumn(
                "hash",
                F.explode(F.array(F.col("hash"), F.expr(_msb_flip_expr("hash")))),
            )
    matched = maybe_bc(probes).join(
        buckets.withColumnRenamed(id_col, "neighbor_id"), ["tree_id", "hash"])
    if max_candidates is None:
        return (matched.select("query_id", "neighbor_id")
                .dropDuplicates(["query_id", "neighbor_id"]))  # closestSet analog (lsh/lsh.go:142)
    # Deterministic cap that MATCHES the reference's arrival-order semantics
    # in what it keeps: the reference scans trees in order and stops adding
    # once maxCandidates distinct ids are seen (lsh/lsh.go:145,163-166), so
    # survivors are biased toward ids found in the EARLIEST trees — and a
    # query's true neighbors sit in its bucket in almost every tree, so they
    # arrive first.  Ordering by bare neighbor_id (the r1-r2 scheme) is
    # neighbor-AGNOSTIC: once candidates ≫ cap (e.g. the reference's SIFT
    # config: ~36k candidates, cap 10k) it keeps a uniform id sample and
    # recall collapses to cap/candidates.  (first_tree, neighbor_id) is
    # fully deterministic, reproducible across engines, and keeps the same
    # neighbors the reference's early exit keeps.
    from pyspark.sql import Window

    agg = (matched.select("query_id", "neighbor_id", "tree_id")
           .groupBy("query_id", "neighbor_id")
           .agg(F.min("tree_id").alias("__first_tree")))
    w = Window.partitionBy("query_id").orderBy(F.asc("__first_tree"),
                                               F.asc("neighbor_id"))
    return (agg.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_candidates)
            .select("query_id", "neighbor_id"))


def _matmul_verify(q: DataFrame, joined: DataFrame, metric: str,
                   collected: tuple[list, np.ndarray] | None = None) -> DataFrame:
    """(query_id, __qvec) queries × (neighbor_id, __cvec, query_id) candidate
    rows → (query_id, neighbor_id, dist): distances via one numpy gather per
    Arrow batch against the broadcast query matrix (NNMock-with-BLAS shape,
    /root/reference/annbench/annbench.go:83-125)."""
    from lsh_search_go_spark.config import TOL

    import pyarrow as pa

    from lsh_search_go_spark.functions import arrowmat as AM

    spark = q.sparkSession
    q_ids, Q = collected if collected is not None else _collect_queries(q)
    bc = spark.sparkContext.broadcast((q_ids, Q))
    qtype = dict(q.dtypes)["query_id"]
    ctype = dict(joined.dtypes)["neighbor_id"]
    schema = f"query_id {qtype}, neighbor_id {ctype}, dist double"

    def op(batches):
        q_ids_l, Qm = bc.value
        Qm = np.asarray(Qm)
        lookup = AM.id_index_lookup(q_ids_l)
        if metric == "cosine":
            qn = np.linalg.norm(Qm, axis=1, keepdims=True)
            Qn = Qm / np.where(qn > TOL, qn, 1.0)

        def compute(batch):
            qid_col = AM.batch_column(batch, "query_id")
            C = AM.matrix_from_column(AM.batch_column(batch, "__cvec"))
            qi = lookup(np.asarray(qid_col))
            if metric == "l2":
                d = np.linalg.norm(C - Qm[qi], axis=1)
            else:
                cn = np.linalg.norm(C, axis=1, keepdims=True)
                Cn = C / np.where(cn > TOL, cn, 1.0)
                d = 1.0 - np.einsum("ij,ij->i", Cn, Qn[qi])
                zero = (cn[:, 0] <= TOL) | (qn[qi, 0] <= TOL)
                d[zero] = 1.0                       # zero-vector guard (helpers.go:224-231)
                d[d < TOL] = 0.0                    # clamp (helpers.go:232-233)
            # id columns pass through untouched (no pandas re-boxing)
            return pa.RecordBatch.from_arrays(
                [qid_col, AM.batch_column(batch, "neighbor_id"), pa.array(d)],
                names=["query_id", "neighbor_id", "dist"])

        for batch in batches:
            if batch.num_rows:
                yield compute(batch)

    return joined.select("query_id", "neighbor_id", "__cvec").mapInArrow(op, schema)


def _matmul_verify_grouped(q: DataFrame, joined: DataFrame, metric: str,
                           collected: tuple[list, np.ndarray] | None = None
                           ) -> DataFrame:
    """(neighbor_id, __cvec, __qids array) rows → (query_id, neighbor_id,
    dist): one corpus-vector transfer per touched row, distances against the
    broadcast query matrix.  O(rows_touched × dims) Arrow traffic instead of
    O(candidate_pairs × dims).

    Memory-bounded (r3 ADVICE): when the pair list is sparse relative to the
    full |rows|×|queries| gram, distances come from a per-pair gathered
    einsum; otherwise the gram is computed in row blocks capped at ~64 MB —
    a 10k-row Arrow batch against a 100k-query broadcast can never
    materialize the naive 8 GB matrix this backend is meant for."""
    from lsh_search_go_spark.config import TOL

    import pyarrow as pa

    from lsh_search_go_spark.functions import arrowmat as AM

    spark = q.sparkSession
    q_ids, Q = collected if collected is not None else _collect_queries(q)
    bc = spark.sparkContext.broadcast((q_ids, Q))
    qtype = dict(q.dtypes)["query_id"]
    ctype = dict(joined.dtypes)["neighbor_id"]
    schema = f"query_id {qtype}, neighbor_id {ctype}, dist double"

    def op(batches):
        q_ids_l, Qm = bc.value
        Qm = np.asarray(Qm)
        lookup = AM.id_index_lookup(q_ids_l)
        q_pa = pa.array(q_ids_l)                # one typed copy per task
        qn = np.linalg.norm(Qm, axis=1)
        qsq = (Qm * Qm).sum(1)                  # fixed per task, not per batch
        if metric == "cosine":
            Qn = Qm / np.where(qn > TOL, qn, 1.0)[:, None]
        for batch in batches:
            if batch.num_rows == 0:
                continue
            C = AM.matrix_from_column(AM.batch_column(batch, "__cvec"))
            qids_col = AM.batch_column(batch, "__qids")
            counts = np.diff(np.asarray(qids_col.offsets).astype(np.int64))
            flat_q = lookup(np.asarray(qids_col.flatten()))
            rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
            nrows = batch.num_rows
            npairs, nq, dims = len(rows), Qm.shape[0], Qm.shape[1]
            budget = 1 << 23                        # ≤64 MB of float64 cells
            if metric == "l2":
                csq = (C * C).sum(1)
                d = np.empty(npairs)
                if npairs * dims <= nrows * nq:
                    # sparse pairs: gathered per-pair dots, chunked
                    step = max(1, budget // max(dims, 1))
                    for s in range(0, npairs, step):
                        rr, qq = rows[s:s + step], flat_q[s:s + step]
                        g = np.einsum("pd,pd->p", C[rr], Qm[qq])
                        d[s:s + step] = np.sqrt(np.maximum(
                            csq[rr] + qsq[qq] - 2.0 * g, 0.0))
                else:
                    # dense pairs: gram in row blocks (rows are sorted, so
                    # each block's pair span is a contiguous slice)
                    step = max(1, budget // max(nq, 1))
                    for s in range(0, nrows, step):
                        e = min(s + step, nrows)
                        lo, hi = np.searchsorted(rows, [s, e])
                        d2 = ((C[s:e] * C[s:e]).sum(1)[:, None] + qsq[None, :]
                              - 2.0 * (C[s:e] @ Qm.T))
                        d[lo:hi] = np.sqrt(np.maximum(
                            d2[rows[lo:hi] - s, flat_q[lo:hi]], 0.0))
            else:
                cn = np.linalg.norm(C, axis=1)
                Cn = C / np.where(cn > TOL, cn, 1.0)[:, None]
                d = np.empty(npairs)
                if npairs * dims <= nrows * nq:
                    step = max(1, budget // max(dims, 1))
                    for s in range(0, npairs, step):
                        rr, qq = rows[s:s + step], flat_q[s:s + step]
                        d[s:s + step] = 1.0 - np.einsum(
                            "pd,pd->p", Cn[rr], Qn[qq])
                else:
                    step = max(1, budget // max(nq, 1))
                    for s in range(0, nrows, step):
                        e = min(s + step, nrows)
                        lo, hi = np.searchsorted(rows, [s, e])
                        dmat = 1.0 - Cn[s:e] @ Qn.T
                        d[lo:hi] = dmat[rows[lo:hi] - s, flat_q[lo:hi]]
                zero = (cn[rows] <= TOL) | (qn[flat_q] <= TOL)
                d[zero] = 1.0                       # zero-vector guard (helpers.go:224-231)
                d[d < TOL] = 0.0                    # clamp (helpers.go:232-233)
            yield pa.RecordBatch.from_arrays(
                [AM.take(q_pa, flat_q),
                 AM.take(AM.batch_column(batch, "neighbor_id"), rows),
                 pa.array(d)],
                names=["query_id", "neighbor_id", "dist"])

    return joined.select("neighbor_id", "__cvec", "__qids").mapInArrow(op, schema)
