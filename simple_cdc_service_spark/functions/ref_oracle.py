"""Seeded numpy/Python reference implementations registered as DuckDB
tables by ``oracle_setup`` hooks — they convert rows-only registry
entries (k-means IVF, SemDeDup blocking, IVFPQ, PQ, hyperplane LSH)
into hash-checked ones in tools/check_oracle.py. ORACLE/TEST-ONLY —
never imported by engine code.

The driver's vanilla-SQL gate still records these entries as rows-only
(__spark_entry__.oracle_sql() excludes oracle_setup entries); the
hash-match evidence lives in the CORRECTNESS_FULL artifacts.

Bit-parity ground rules (why an exact hash-match is achievable):

- The engine's index TRAINING (kmeans_centroids, pq_train_codebooks in
  operators/similarity.py) is driver-side seeded numpy, deterministic
  for a fixed (seed, data). The reference re-runs the same numerical
  recipe — same op order, same dtypes — on vectors fetched through
  DuckDB instead of Spark, which yields bit-identical IEEE-754 results
  on the same host. Training parity is therefore BY CONSTRUCTION; what
  the oracle independently verifies is everything DISTRIBUTED: list
  assignment, probing, candidate generation, scoring folds, window
  top-k, and pair semantics.
- The engine's distributed cosine is a sequential left-fold
  (functions.dot → F.aggregate); a plain Python accumulation loop (and
  DuckDB's list_dot_product — parity proven by the hash-matched
  knn_bruteforce/knn_ivf oracles) performs the same binary64 adds in
  the same order.
- Engine ``F.round(x, n)`` on doubles is JVM
  ``BigDecimal.valueOf(x).setScale(n, HALF_UP)`` — replicated by
  ``Decimal(repr(x)).quantize(10^-n, ROUND_HALF_UP)`` (both parse the
  shortest decimal representation of the double).
- ``round(float(x), n)`` calls INSIDE engine pandas UDFs are Python
  banker's rounding; the reference uses the identical builtin there.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


class OracleOutOfScale(RuntimeError):
    """Raised by an oracle_setup hook when the corpus size puts the
    ENGINE into a regime this oracle does not mirror (e.g. the IMI
    coarse-quantizer switch past the flat k=1024 cap). The check
    harness records the entry as an explicit flagged skip instead of a
    spurious mismatch (ADVICE r9 #1); engine-only scale sweeps cover
    that regime."""


# ---------------------------------------------------------------------------
# numeric primitives mirroring the engine's folds
# ---------------------------------------------------------------------------


def _dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos(a, b) -> float:
    import math

    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def _round_spark(x: float, n: int = 6) -> float:
    """JVM BigDecimal.valueOf(x).setScale(n, HALF_UP) — see module doc."""
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{n}"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# data access + registration
# ---------------------------------------------------------------------------

_UNION_PLANTED = (
    "SELECT vec_id, embedding FROM embeddings UNION ALL "
    "SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings "
    "WHERE vec_id < 50"
)


def _fetch(con, src_sql: str):
    """(ids int64 ndarray, vecs float64 ndarray) for a vector source."""
    import numpy as np

    df = con.execute(
        f"SELECT vec_id, embedding FROM ({src_sql}) ORDER BY vec_id"
    ).df()
    ids = df["vec_id"].to_numpy()
    vecs = np.array(list(df["embedding"]), dtype=np.float64)
    return ids, vecs


def _register(con, name: str, pdf) -> None:
    con.register(f"__tmp_{name}", pdf)
    con.execute(f"CREATE OR REPLACE TABLE {name} AS SELECT * FROM __tmp_{name}")
    con.unregister(f"__tmp_{name}")


# ---------------------------------------------------------------------------
# training references (same numerical recipe as operators/similarity.py)
# ---------------------------------------------------------------------------


def _seeded_sample(ids, vecs, seed: int, cap: int):
    """Engine sample order: rank by xxhash64(vec_id, seed) ascending, cap.
    64-bit hash ties don't occur, so the order is total. Hashes come from
    the vectorized numpy kernel (bit-parity with the scalar reference
    pinned in tests) — the per-id scalar loop was O(corpus) Python at
    sweep time."""
    import numpy as np

    from .xxh64_np import spark_xxhash64_long_int_batch

    hs = spark_xxhash64_long_int_batch(np.asarray(ids, dtype=np.int64), seed)
    order = np.argsort(hs, kind="stable")[:cap]
    return vecs[order]


def _adaptive_n_centroids(
    n_rows: int, target_per_list: int = 1024, lo: int = 16, hi: int = 1024
) -> int:
    """Mirror of operators/similarity.py::adaptive_n_centroids — the
    oracle recomputes the engine's scale-adaptive list/cluster count
    from its own COUNT(*) so the trained reference uses the identical
    k at every sf."""
    import math

    if n_rows <= 0:
        return lo
    return max(lo, min(hi, math.ceil(n_rows / target_per_list)))


def _count(con, src_sql: str) -> int:
    return int(con.execute(f"SELECT count(*) FROM ({src_sql})").fetchone()[0])


def _adaptive_lsh_params(
    n_rows: int,
    threshold: float,
    base_bands: int = 8,
    base_rbits: int = 8,
    target_per_bucket: int = 1024,
    hi_rbits: int = 16,
) -> tuple[int, int]:
    """Mirror of operators/dedup.py::adaptive_lsh_params — the oracle
    recomputes the engine's scale-adaptive (bands, rbits) from its own
    COUNT(*) so the registered hyperplane table has the identical shape
    at every sf (N <= 262,144 stays on the historical (8, 8))."""
    import math

    if n_rows <= target_per_bucket:
        return base_bands, base_rbits
    rbits = max(
        base_rbits,
        min(hi_rbits, (-(-n_rows // target_per_bucket) - 1).bit_length()),
    )
    if rbits == base_rbits:
        return base_bands, base_rbits
    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    p = min(max(p, 1e-9), 1.0 - 1e-9)
    num = 1.0 - p**base_rbits
    den = 1.0 - p**rbits
    if num >= 1.0 or den >= 1.0:
        # underflow guard — mirrors the engine exactly (threshold near
        # -1 makes log(1.0) == 0; fall back to the historical shape).
        return base_bands, base_rbits
    bands = math.ceil(base_bands * math.log(num) / math.log(den) - 1e-9)
    return min(max(base_bands, bands), 8 * base_bands), rbits


def kmeans_centroids_ref(con, src_sql: str, n_centroids: int, seed: int = 42):
    """Mirror of operators/similarity.py::kmeans_centroids — seeded-hash
    sample, default_rng(seed) init, 20 Lloyd rounds over the identical
    numpy algebra. Returns (n_centroids, dim) float64."""
    import numpy as np

    ids, vecs = _fetch(con, src_sql)
    cap = max(4096, 256 * n_centroids)
    x = _seeded_sample(ids, vecs, seed, cap)
    rng = np.random.default_rng(seed)
    cent = x[rng.permutation(len(x))[:n_centroids]].copy()
    for _ in range(20):
        # tiled assign (r8) — tile size mirrors kmeans_centroids so the
        # engine and this reference keep identical BLAS call shapes
        assign = np.empty(len(x), dtype=np.int64)
        cn = (cent * cent).sum(axis=1)
        for s in range(0, len(x), 16384):
            xb = x[s : s + 16384]
            assign[s : s + 16384] = (
                -2.0 * xb @ cent.T + cn[None, :]
            ).argmin(axis=1)
        new = cent.copy()
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                new[c] = x[mask].mean(axis=0)
        if np.allclose(new, cent):
            break
        cent = new
    return cent


def pq_codebooks_ref(
    con, src_sql: str, m: int, ksub: int, seed: int = 42,
    max_train_rows: int = 4096, iters: int = 15,
):
    """Mirror of operators/similarity.py::pq_train_codebooks — normalized
    seeded sample, ONE default_rng consumed across subspaces in j order."""
    import numpy as np

    ids, vecs = _fetch(con, src_sql)
    x = _seeded_sample(ids, vecs, seed, max_train_rows)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    dsub = x.shape[1] // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        xj = x[:, j * dsub : (j + 1) * dsub]
        cent = xj[rng.permutation(len(xj))[:ksub]].copy()
        for _ in range(iters):
            d2 = ((xj[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cent[c] = xj[mask].mean(axis=0)
        books.append(cent)
    return np.stack(books)  # (m, ksub, dsub)


def _assign_lists(ids, vecs, cent, nprobe: int):
    """ivf_assign mirror: per vector, rank centroids by UNROUNDED
    sequential-fold cosine DESC with centroid_id tiebreak; keep nprobe.
    Returns {vec_id: [centroid_id, ...]} (ranked order)."""
    out = {}
    for vid, v in zip(ids, vecs):
        sims = [(-_cos(v, c), ci) for ci, c in enumerate(cent)]
        sims.sort()
        out[int(vid)] = [ci for _, ci in sims[:nprobe]]
    return out


# ---------------------------------------------------------------------------
# oracle_setup hooks
# ---------------------------------------------------------------------------


# Flat-quantizer oracle SQL for knn_ivf_kmeans (the formulation that has
# carried the hash evidence since r6): same shape as the hash-matched
# knn_ivf oracle, with the every-Nth centroid grid replaced by the
# registered numpy-Lloyd reference centroids and nprobe=8. Registered as
# a VIEW body by setup_knn_ivf_kmeans so the same oracle name serves
# both coarse-quantizer regimes (ADVICE r9 #1).
_IVFK_FLAT_SQL = """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    corpus AS (SELECT vec_id, v FROM e WHERE vec_id >= 5),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
    cents AS (SELECT centroid_id, cv FROM ref_cents_ivf),
    ca AS (SELECT vec_id AS neighbor_id, v AS cv2, centroid_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY
                      list_dot_product(v, cv)
                      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
                      DESC, centroid_id) AS rn
           FROM corpus CROSS JOIN cents),
    qa AS (SELECT vec_id AS query_id, v AS qv, centroid_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY
                      list_dot_product(v, cv)
                      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
                      DESC, centroid_id) AS rn
           FROM q CROSS JOIN cents),
    scored AS (SELECT query_id, neighbor_id,
                      round(list_dot_product(qv, cv2)
                            / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv2, cv2))),
                            6) AS cos_sim
               FROM (SELECT * FROM ca WHERE rn = 1) c
               JOIN (SELECT * FROM qa WHERE rn <= 8) USING (centroid_id)),
    r AS (SELECT *, CAST(row_number() OVER (
              PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
          FROM scored)
    SELECT query_id, neighbor_id, rank, cos_sim FROM r WHERE rank <= 10
"""


def setup_knn_ivf_kmeans(con) -> None:
    """Registers ref_knn_ivfk, mirroring the engine's
    adaptive_coarse_shape regime switch (ADVICE r9 #1 — before this the
    flat SQL oracle was registered unconditionally, so a >1M-vector
    corpus run reported a spurious engine/oracle mismatch):

    - N within the flat cap (ceil(N/1024) <= 1024, every committed
      oracle scale): ref_cents_ivf holds the numpy-Lloyd centroids at
      the engine's adaptive list count and ref_knn_ivfk is a VIEW over
      the unchanged flat SQL formulation — bit-identical evidence path.
    - N past the cap: the engine's knn_ivf_kmeans entry returns
      knn_imi(k_half adaptive, nprobe=8); ref_knn_ivfk is the matching
      numpy IMI expected result (_expected_imi_result, same defaults)."""
    import math

    import pandas as pd

    src = "SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5"
    n = _count(con, src)
    # mirror of adaptive_coarse_shape's regime predicate (flat_hi=128,
    # target=1024, r10): flat while ceil(N/target) <= flat_hi
    if n <= 0 or math.ceil(n / 1024) <= 128:
        cent = kmeans_centroids_ref(con, src, _adaptive_n_centroids(n))
        _register(
            con,
            "ref_cents_ivf",
            pd.DataFrame(
                {"centroid_id": range(len(cent)), "cv": [list(c) for c in cent]}
            ),
        )
        con.execute(f"CREATE OR REPLACE VIEW ref_knn_ivfk AS {_IVFK_FLAT_SQL}")
        return
    _register(
        con,
        "ref_knn_ivfk",
        _expected_imi_result(
            con,
            src,
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5",
            k=10,
            nprobe=8,
        ),
    )


# The UNION-planted source frame with the engine's double cast — the
# shared src CTE of both ref_sem_assign regimes.
_SEM_SRC_SQL = """
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings WHERE vec_id < 50
"""

# Flat-regime assignment view body: the rn=1 nearest-centroid SQL that
# carried dedup_semantic's hash evidence since r6 (assignment ranks
# compare UNROUNDED cosines, ties to the lowest centroid_id).
_SEM_FLAT_ASSIGN_SQL = f"""
    WITH src AS ({_SEM_SRC_SQL}),
    ca AS (SELECT vec_id, v, centroid_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY
                      list_dot_product(v, cv)
                      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
                      DESC, centroid_id) AS rn
           FROM src CROSS JOIN (SELECT centroid_id, cv FROM ref_cents_sem))
    SELECT vec_id, v, centroid_id FROM ca WHERE rn = 1
"""


def setup_dedup_semantic(con) -> None:
    """Registers ref_sem_assign (vec_id, v, centroid_id): the blocking
    assignment of the planted-duplicate UNION frame, mirroring the
    engine's adaptive_coarse_shape regime (VERDICT r10 #1 — until r11
    the IMI regime raised OracleOutOfScale, leaving the 131k+ window
    engine-only where r6-r8 had sf1 hash evidence):

    - flat (every committed oracle scale): ref_cents_sem holds the
      numpy-Lloyd centroids and ref_sem_assign is the UNCHANGED rn=1
      nearest-centroid SQL view — same algebra the r6-r10 oracle ran,
      so committed hashes are untouched.
    - IMI (past the flat cap): ref_sem_cells holds the numpy cell
      assignment (first-min argmin per half over the identical fold
      order, mirroring imi_assign at nprobe=1) and ref_sem_assign joins
      it back to the src frame.

    The registry's oracle SQL (the within-block pairing) is one
    formulation over ref_sem_assign either way."""
    import math

    import numpy as np
    import pandas as pd

    n = _count(con, _UNION_PLANTED)
    if n > 0 and math.ceil(n / 1024) > 128:
        ids, vecs = _fetch(con, _UNION_PLANTED)
        cb1, cb2 = imi_codebooks_ref(
            con, _UNION_PLANTED, _adaptive_imi_khalf(n)
        )
        d1, d2 = _imi_cell_distances(vecs, cb1, cb2)
        cells = d1.argmin(axis=1) * len(cb2) + d2.argmin(axis=1)
        _register(
            con,
            "ref_sem_cells",
            pd.DataFrame(
                {"vec_id": ids.astype(np.int64), "centroid_id": cells}
            ),
        )
        con.execute(
            f"CREATE OR REPLACE VIEW ref_sem_assign AS "
            f"WITH src AS ({_SEM_SRC_SQL}) "
            f"SELECT s.vec_id, s.v, r.centroid_id "
            f"FROM src s JOIN ref_sem_cells r USING (vec_id)"
        )
        return
    cent = kmeans_centroids_ref(con, _UNION_PLANTED, _adaptive_n_centroids(n))
    _register(
        con,
        "ref_cents_sem",
        pd.DataFrame(
            {"centroid_id": range(len(cent)), "cv": [list(c) for c in cent]}
        ),
    )
    con.execute(
        f"CREATE OR REPLACE VIEW ref_sem_assign AS {_SEM_FLAT_ASSIGN_SQL}"
    )


def setup_dedup_embedding_lsh(con) -> None:
    """Registers ref_lsh_planes (band, j, p): the RandomState(42)
    hyperplanes of operators/dedup.py::embedding_dup_pairs_lsh at the
    scale-adaptive (bands, rbits) of the registry corpus (embeddings +
    the <50 planted copies, non-null vectors — the same N the engine
    counts). Sign buckets + verification are pure SQL; the oracle query
    groups by the table's band column and string_aggs ORDER BY j, so it
    adapts to any registered shape with no SQL change."""
    import numpy as np
    import pandas as pd

    n = _count(
        con,
        "SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL",
    ) + _count(
        con,
        "SELECT vec_id FROM embeddings "
        "WHERE embedding IS NOT NULL AND vec_id < 50",
    )
    bands, rbits = _adaptive_lsh_params(n, threshold=0.98)
    dim = con.execute("SELECT len(embedding) FROM embeddings LIMIT 1").fetchone()
    planes = np.random.RandomState(42).standard_normal((bands * rbits, int(dim[0])))
    _register(
        con,
        "ref_lsh_planes",
        pd.DataFrame(
            {
                "band": [i // rbits for i in range(bands * rbits)],
                "j": [i % rbits for i in range(bands * rbits)],
                "p": [list(planes[i]) for i in range(bands * rbits)],
            }
        ),
    )


def _expected_pq_result(
    con,
    corpus_sql: str,
    queries_sql: str,
    k: int,
    m: int,
    ksub: int,
    rerank: int,
    seed: int = 42,
    n_centroids: int | None = None,
    nprobe: int = 0,
    imi_khalf: int | None = None,
):
    """Full expected result of knn_pq / knn_ivfpq: ADC shortlist + exact
    cosine re-rank, computed in numpy/Python with the engine's exact op
    order (see module doc). Returns a pandas frame
    (query_id, neighbor_id, rank, cos_sim).

    Coarse stage mirrors BOTH engine regimes (VERDICT r10 #1 — the r10
    flat→IMI crossover left the 131k+ window engine-only):
    ``n_centroids`` set → flat k-means lists (cosine-ranked, the r6-r8
    evidence path); ``imi_khalf`` set → IMI cells: corpus cell =
    first-min argmin per half (imi_assign nprobe=1), query probe set =
    top-``nprobe`` cells of the d1+d2 grid under the stable full-grid
    argsort (provably identical to the engine's subgrid multiprobe);
    neither → no coarse stage (knn_pq)."""
    import numpy as np
    import pandas as pd

    c_ids, c_vecs = _fetch(con, corpus_sql)
    q_ids, q_vecs = _fetch(con, queries_sql)
    books = pq_codebooks_ref(con, corpus_sql, m, ksub, seed)
    dsub = books.shape[2]

    if imi_khalf:
        cb1, cb2 = imi_codebooks_ref(con, corpus_sql, imi_khalf, seed)
        k2 = len(cb2)
        d1c, d2c = _imi_cell_distances(c_vecs, cb1, cb2)
        c_cells = d1c.argmin(axis=1) * k2 + d2c.argmin(axis=1)
        d1q, d2q = _imi_cell_distances(q_vecs, cb1, cb2)
        probe = min(nprobe, len(cb1) * k2)
        probe_sets = {}
        for qi, qid in enumerate(q_ids):
            g = (d1q[qi][:, None] + d2q[qi][None, :]).ravel()
            probe_sets[int(qid)] = {
                int(t) for t in np.argsort(g, kind="stable")[:probe]
            }
        probed_ids = sorted({c for s in probe_sets.values() for c in s})
        keep = np.isin(c_cells, probed_ids)
        c_ids, c_vecs = c_ids[keep], c_vecs[keep]
        c_lists = c_cells[keep]
    elif n_centroids:
        cent = kmeans_centroids_ref(con, corpus_sql, n_centroids, seed)
        corpus_list = _assign_lists(c_ids, c_vecs, cent, 1)
        probe_sets = {
            q: set(ls) for q, ls in _assign_lists(q_ids, q_vecs, cent, nprobe).items()
        }
        probed_ids = sorted({c for s in probe_sets.values() for c in s})
        keep = np.array(
            [corpus_list[int(i)][0] in probed_ids for i in c_ids], dtype=bool
        )
        c_ids, c_vecs = c_ids[keep], c_vecs[keep]
        c_lists = np.array([corpus_list[int(i)][0] for i in c_ids], dtype=np.int64)
    else:
        probe_sets = None
        c_lists = None

    # encode (engine UDF math: row-normalize, per-subspace argmin)
    xn = c_vecs / np.linalg.norm(c_vecs, axis=1, keepdims=True)
    xs = xn.reshape(len(c_ids), m, dsub)
    codes = np.empty((len(c_ids), m), dtype=np.int64)
    for j in range(m):
        d2 = ((xs[:, j, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
    qn = q_vecs / np.linalg.norm(q_vecs, axis=1, keepdims=True)
    luts = np.stack(
        [((q.reshape(m, dsub)[:, None, :] - books) ** 2).sum(axis=2) for q in qn]
    )

    out = []
    short = max(k, rerank)
    for qi, qid in enumerate(q_ids):
        if probe_sets is not None:
            mask = np.isin(c_lists, list(probe_sets.get(int(qid), ())))
            if not mask.any():
                continue
            mids, mcodes = c_ids[mask], codes[mask]
        else:
            mids, mcodes = c_ids, codes
        dist = luts[qi][np.arange(m)[None, :], mcodes].sum(axis=1)
        # shortlist: engine = per-batch top by UNROUNDED (lexsort), global
        # window by round(.,6) ASC + id; equal here absent boundary ties
        order = np.lexsort((mids, dist))[:short]
        qv = q_vecs[qi]
        rows = []
        for ji in order:
            nb = int(mids[ji])
            ci = np.searchsorted(c_ids, nb)
            rows.append((nb, _round_spark(_cos(qv, c_vecs[ci]))))
        rows.sort(key=lambda r: (-r[1], r[0]))
        for rank, (nb, cs) in enumerate(rows[:k], 1):
            out.append(
                {"query_id": int(qid), "neighbor_id": nb, "rank": rank,
                 "cos_sim": cs}
            )
    return pd.DataFrame(out, columns=["query_id", "neighbor_id", "rank", "cos_sim"])


def setup_knn_pq(con) -> None:
    _register(
        con,
        "ref_knn_pq",
        _expected_pq_result(
            con,
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5",
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5",
            k=10, m=8, ksub=64, rerank=100,
        ),
    )


def setup_knn_ivfpq(con) -> None:
    """Mirrors the engine's adaptive_coarse_shape regime switch
    (VERDICT r10 #1 — until r11 the IMI regime raised OracleOutOfScale,
    leaving the 131k+ window engine-only where r6-r8 had sf1 hash
    evidence): flat-kmeans coarse within the cap (the unchanged
    committed-scale evidence path), IMI coarse cells beyond it, both
    through the same _expected_pq_result ADC + re-rank tail."""
    import math

    src = "SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5"
    queries = "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5"
    n = _count(con, src)
    if n > 0 and math.ceil(n / 1024) > 128:
        _register(
            con,
            "ref_knn_ivfpq",
            _expected_pq_result(
                con, src, queries,
                k=10, m=8, ksub=16, rerank=50,
                imi_khalf=_adaptive_imi_khalf(n),
                nprobe=8,
            ),
        )
        return
    _register(
        con,
        "ref_knn_ivfpq",
        _expected_pq_result(
            con, src, queries,
            k=10, m=8, ksub=16, rerank=50,
            n_centroids=_adaptive_n_centroids(n),
            nprobe=8,
        ),
    )

def setup_knn_ivfpq_hires(con) -> None:
    """Mirror of the knn_ivfpq_hires registry entry (r11): the
    clustered-corpus IVFPQ configuration the RECALL_CURVES_r11
    measurement justified — ksub=256 (8-bit codes, the FAISS-standard
    resolution at IDENTICAL storage to the 4-bit-in-a-byte ksub=16),
    rerank=200, and the scale-adaptive probe under the IMI regime.
    Same regime dispatch as setup_knn_ivfpq."""
    import math

    src = "SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5"
    queries = "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5"
    n = _count(con, src)
    if n > 0 and math.ceil(n / 1024) > 128:
        k_half = _adaptive_imi_khalf(n)
        _register(
            con,
            "ref_knn_ivfpq_hires",
            _expected_pq_result(
                con, src, queries,
                k=10, m=8, ksub=256, rerank=200,
                imi_khalf=k_half,
                nprobe=_adaptive_imi_nprobe(k_half * k_half),
            ),
        )
        return
    _register(
        con,
        "ref_knn_ivfpq_hires",
        _expected_pq_result(
            con, src, queries,
            k=10, m=8, ksub=256, rerank=200,
            n_centroids=_adaptive_n_centroids(n),
            nprobe=8,
        ),
    )


def _expected_kmeans_summary(con, src_sql: str, n_clusters: int, seed: int = 42):
    """Full expected result of embedding_kmeans (kmeans_cluster_summary):
    centroid training is the shared numpy recipe (parity by
    construction); assignment is the engine's array_max over
    (sequential-fold cosine, -cluster_id) structs — max sim, ties to the
    lowest id; the per-cluster mean replicates the engine's EXACT
    decimal accumulation: each double sim is quantized to 1e-18 HALF_UP
    on its shortest decimal repr (JVM cast double→decimal(20,18)
    semantics), decimals are summed exactly (order-free), the sum goes
    back to the nearest double (decimal→double cast), divides by the
    count, and rounds HALF_UP to 4 (engine F.round)."""
    import pandas as pd

    ids, vecs = _fetch(con, src_sql)
    cent = kmeans_centroids_ref(con, src_sql, n_clusters, seed)
    q18 = Decimal("1e-18")
    sums: dict[int, Decimal] = {}
    counts: dict[int, int] = {}
    for v in vecs:
        sims = [_cos(v, c) for c in cent]
        best = min(range(len(cent)), key=lambda c: (-sims[c], c))
        sums[best] = sums.get(best, Decimal(0)) + Decimal(
            repr(sims[best])
        ).quantize(q18, ROUND_HALF_UP)
        counts[best] = counts.get(best, 0) + 1
    out = [
        {
            "cluster_id": cid,
            "n_vecs": counts[cid],
            "avg_cos_to_centroid": _round_spark(float(sums[cid]) / counts[cid], 4),
        }
        for cid in sorted(counts)
    ]
    pdf = pd.DataFrame(out, columns=["cluster_id", "n_vecs", "avg_cos_to_centroid"])
    return pdf.astype(
        {"cluster_id": "int64", "n_vecs": "int64", "avg_cos_to_centroid": "float64"}
    )


def setup_embedding_kmeans(con) -> None:
    """Registers ref_embedding_kmeans: the full expected cluster summary
    over the whole embeddings table (n_clusters=8, seed=42)."""
    _register(
        con,
        "ref_embedding_kmeans",
        _expected_kmeans_summary(
            con, "SELECT vec_id, embedding FROM embeddings", 8
        ),
    )


# ---------------------------------------------------------------------------
# IMI (inverted multi-index) references — mirror of
# operators/similarity.py::{adaptive_imi_khalf, imi_codebooks, imi_assign,
# knn_imi} (r9, VERDICT r8 #3)
# ---------------------------------------------------------------------------


def _adaptive_imi_khalf(
    n_rows: int, target_per_list: int = 1024, lo: int = 16, hi_khalf: int = 4096
) -> int:
    """Mirror of operators/similarity.py::adaptive_imi_khalf."""
    import math

    cells = max(lo, math.ceil(n_rows / target_per_list)) if n_rows > 0 else lo
    return max(2, min(hi_khalf, math.ceil(math.sqrt(cells))))


def imi_codebooks_ref(con, src_sql: str, k_half: int, seed: int = 42):
    """Mirror of operators/similarity.py::imi_codebooks — identical
    seeded-hash sample, row normalization (np.linalg.norm on the SAME
    full sample matrix → identical low bits), one default_rng consumed
    across halves in order, tiled expanded-form Lloyd assign."""
    import numpy as np

    ids, vecs = _fetch(con, src_sql)
    if len(ids) == 0:
        return None
    cap = max(4096, 256 * k_half)
    x = _seeded_sample(ids, vecs, seed, cap)
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    nrm[nrm == 0.0] = 1.0
    x = x / nrm
    dsub = x.shape[1] // 2
    rng = np.random.default_rng(seed)
    books = []
    for xj in (x[:, :dsub], x[:, dsub:]):
        kj = min(k_half, len(xj))
        cent = xj[rng.permutation(len(xj))[:kj]].copy()
        for _ in range(20):
            assign = np.empty(len(xj), dtype=np.int64)
            cn = (cent * cent).sum(axis=1)
            for s in range(0, len(xj), 16384):
                xb = xj[s : s + 16384]
                assign[s : s + 16384] = (-2.0 * xb @ cent.T + cn[None, :]).argmin(
                    axis=1
                )
            new = cent.copy()
            for c in range(len(cent)):
                mask = assign == c
                if mask.any():
                    new[c] = xj[mask].mean(axis=0)
            if np.allclose(new, cent):
                break
            cent = new
        books.append(cent)
    return books[0], books[1]


def _imi_cell_distances(vecs, cb1, cb2):
    """The imi_assign kernel's distance algebra over a full matrix:
    per-dimension elementwise folds in index order (IEEE per-element →
    identical values at any batching). Returns (d1, d2)."""
    import numpy as np

    n = len(vecs)
    dsub = cb1.shape[1]
    d = dsub + cb2.shape[1]
    nrm = np.zeros(n)
    for dd in range(d):
        xd = vecs[:, dd]
        nrm += xd * xd
    nrm = np.sqrt(nrm)
    nrm[nrm == 0.0] = 1.0
    xn = vecs / nrm[:, None]
    d1 = np.zeros((n, len(cb1)))
    for dd in range(dsub):
        diff = xn[:, dd, None] - cb1[None, :, dd]
        d1 += diff * diff
    d2 = np.zeros((n, len(cb2)))
    for dd in range(d - dsub):
        diff = xn[:, dsub + dd, None] - cb2[None, :, dd]
        d2 += diff * diff
    return d1, d2


def _expected_imi_result(
    con, corpus_sql: str, queries_sql: str, k: int, nprobe: int, seed: int = 42,
    k_half: int | None = None, train_sql: str | None = None,
):
    """Full expected result of knn_imi: cell assignment (first-min argmin
    per half), query cells ranked by d1+d2 (stable ascending = lowest
    cell id on ties), exact sequential-fold cosine on candidates,
    (round6 DESC, id) ranking. Returns (query_id, neighbor_id, rank,
    cos_sim).

    ``train_sql`` (r11): train the codebooks on a SUBSET of the corpus
    (default: the corpus itself) — mirrors the incremental-index path
    (build_imi_index on the base, append_imi_index for the rest: the
    grid is frozen at build, so the full corpus assigns under the
    base-trained codebooks). k_half then defaults from the TRAINING
    set's count, matching the engine's build-time adaptive choice."""
    import numpy as np
    import pandas as pd

    if train_sql is None:
        train_sql = corpus_sql
    c_ids, c_vecs = _fetch(con, corpus_sql)
    q_ids, q_vecs = _fetch(con, queries_sql)
    if k_half is None:
        k_half = _adaptive_imi_khalf(_count(con, train_sql))
    cb = imi_codebooks_ref(con, train_sql, k_half, seed)
    out_cols = ["query_id", "neighbor_id", "rank", "cos_sim"]
    if cb is None or len(q_ids) == 0:
        return pd.DataFrame([], columns=out_cols)
    cb1, cb2 = cb
    k2 = len(cb2)
    d1c, d2c = _imi_cell_distances(c_vecs, cb1, cb2)
    c_cells = d1c.argmin(axis=1) * k2 + d2c.argmin(axis=1)
    d1q, d2q = _imi_cell_distances(q_vecs, cb1, cb2)
    probe = min(nprobe, len(cb1) * k2)
    out = []
    for qi, qid in enumerate(q_ids):
        g = (d1q[qi][:, None] + d2q[qi][None, :]).ravel()
        cells = set(int(t) for t in np.argsort(g, kind="stable")[:probe])
        rows = []
        for idx, (ci, cid) in enumerate(zip(c_cells, c_ids)):
            if int(ci) in cells:
                rows.append(
                    (int(cid), _round_spark(_cos(q_vecs[qi], c_vecs[idx])))
                )
        rows.sort(key=lambda r: (-r[1], r[0]))
        for rank, (nb, cs) in enumerate(rows[:k], 1):
            out.append(
                {"query_id": int(qid), "neighbor_id": nb, "rank": rank, "cos_sim": cs}
            )
    return pd.DataFrame(out, columns=out_cols)


def setup_knn_imi(con) -> None:
    _register(
        con,
        "ref_knn_imi",
        _expected_imi_result(
            con,
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5",
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5",
            k=10, nprobe=8,
        ),
    )


def _adaptive_imi_nprobe(n_cells: int, base: int = 32, frac: int = 4) -> int:
    """Mirror of operators/similarity.py::adaptive_imi_nprobe."""
    import math

    if n_cells <= 0:
        return base
    return max(base, math.ceil(n_cells / frac))


def setup_knn_imi_mp(con) -> None:
    """knn_imi_mp's oracle: same expected-result mirror, with the
    scale-adaptive nprobe recomputed from COUNT(*) (quarter of the
    grid, floored at 32 — probes every cell at committed oracle
    scales). The mirror ranks cells with the FULL-grid stable argsort;
    the engine's subgrid multiprobe (r10) is provably identical, so one
    formulation serves both."""
    src = "SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5"
    k_half = _adaptive_imi_khalf(_count(con, src))
    _register(
        con,
        "ref_knn_imi_mp",
        _expected_imi_result(
            con,
            src,
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5",
            k=10,
            nprobe=_adaptive_imi_nprobe(k_half * k_half),
            k_half=k_half,
        ),
    )


def setup_knn_imi_indexed_incr(con) -> None:
    """knn_imi_indexed_incr's oracle: the index was BUILT on the odd
    vec_ids (codebooks trained there, k_half from THEIR count) and the
    even vec_ids were APPENDED under the frozen grid — so the expected
    result is the full corpus assigned under odd-trained codebooks.
    One mirror line: train_sql = the odd subset."""
    train = (
        "SELECT vec_id, embedding FROM embeddings "
        "WHERE vec_id >= 5 AND vec_id % 2 = 1"
    )
    k_half = _adaptive_imi_khalf(_count(con, train))
    _register(
        con,
        "ref_knn_imi_indexed_incr",
        _expected_imi_result(
            con,
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5",
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5",
            k=10,
            nprobe=_adaptive_imi_nprobe(k_half * k_half),
            k_half=k_half,
            train_sql=train,
        ),
    )
