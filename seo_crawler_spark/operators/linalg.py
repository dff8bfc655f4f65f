"""Distributed linear algebra over the embedding column — the two
operations an embedding-heavy curation pipeline runs before/alongside
ANN: principal-component extraction (drift/anisotropy audits, whitening
decisions, "is this embedding space collapsed?" checks) and
Johnson-Lindenstrauss random projection (cheap dimensionality reduction
ahead of LSH/IVF index builds — project 64 → 16 dims, bucket there).

Both follow the repo's integer-exactness discipline (ADR in
simsearch.py/sketches.py): embeddings land on a fixed-point grid
(q = floor(v·1e4)), every corpus-scale aggregate is an exact int64 sum,
and the one data-dependent normalization (power-iteration rescale) is
stated as sign(x)·(|x| div s) so truncation semantics agree between
Spark (`div` truncates toward zero) and DuckDB (`//` floors — equal on
the non-negative |x|).

Scale shapes:

* PCA: the corpus-scale work is ONE map-side-combined (d1, d2) sum
  building the Gram matrix A = Σ q qᵀ (dim² = 4,096 cells — constant
  state regardless of corpus size) plus a (d) sum for the mean vector.
  The 64×64 scatter matrix M = n·A − b bᵀ is then a DRIVER CONSTANT
  (the trained-quantizer pattern: kmeans centroids, BPE merges), and
  power iteration runs on it in exact integer arithmetic; the final
  per-document projection is a row-local dot against the broadcast
  eigenvector. At dim ≫ 64 the row-local pair generation (dim² values
  per row) would swap to a Pandas-UDF outer-product accumulation —
  same single-shuffle plan, Arrow-batched.
* JL projection: entirely ROW-LOCAL — the ±1 projection matrix is a
  deterministic md5-derived literal (Achlioptas 2003 sign matrix), so
  reducing every vector is an embarrassingly parallel map with zero
  exchanges.

References: Achlioptas 2003 (database-friendly random projections),
Johnson & Lindenstrauss 1984, standard power iteration. Public
knowledge only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

PCA_Q = 10_000          # fixed-point grid for embedding components
PCA_VSCALE = 1_000_000  # eigenvector grid (and the rescale target)
PCA_ITERS = 50          # power-iteration rounds (fixed, both engines).
                        # Convergence is (λ2/λ1)^t and the synthetic
                        # embeddings are near-isotropic (gap ~1.07 at
                        # sf0.001, ~1.013 at sf0.01), so 50 rounds reach
                        # cos ≈ 0.997 / 0.92 vs the true eigenvector
                        # (pinned in tests); the iteration runs on a
                        # 64×64 DRIVER constant, so rounds are free —
                        # the corpus is touched exactly twice regardless
DIM = 64                # embedding width of the shipped corpus

RP_K = 16               # reduced dimensionality of the JL projection


def _jl_sign(k: int, d: int) -> int:
    """Deterministic ±1 from md5 — the same literal lands in the Spark
    plan and the generated oracle SQL."""
    h = int(hashlib.md5(f"{k}:{d}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def _qarr(emb: DataFrame) -> DataFrame:
    """(vec_id, label, q) with q = the int64 fixed-point embedding.

    Round-6 note: expressions in this module are built as SQL strings
    (one py4j parse call) rather than python loops over F.lit/F.col —
    constructing the 16×64-literal JL projection through the Column API
    cost ~2.4 s of driver-side py4j round-trips PER CALL (measured;
    ~0.15 s as parsed strings). Same resolved plans, same results."""
    return emb.selectExpr(
        "vec_id",
        "label",
        "transform(embedding, x -> cast(floor(cast(x as double) * "
        f"{PCA_Q}) as long)) AS q",
    ).localCheckpoint(eager=True)


def _power_iterate(m: list[list[int]], iters: int) -> list[int]:
    """Exact-integer power iteration on the (downscaled) scatter
    matrix; pure driver arithmetic on a dim×dim constant."""
    dim = len(m)
    v = [PCA_VSCALE] * dim
    for _ in range(iters):
        w = [sum(m[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        mx = max(1, max(abs(x) for x in w))
        v = [
            (1 if x >= 0 else -1) * ((abs(x) * PCA_VSCALE) // mx) for x in w
        ]
    return v


def pca_power_projection(
    spark: SparkSession, sf_dir: str, iters: int = PCA_ITERS
) -> DataFrame:
    """Per-vector coordinate along the corpus's top principal component
    (power iteration on the exact-integer scatter matrix) — the
    embedding-space audit column: outliers along PC1 are drift/garbage
    candidates, a PC1 that explains ~everything means a collapsed
    space, and the coordinate is the natural stratifier for
    embedding-balanced sampling.

    Exactness: centering uses the n-scaled scatter identity
    M = n·Σqqᵀ − (Σq)(Σq)ᵀ (all int64 — no float means), the matrix is
    downscaled once by D = max(1, max|M| div 1e6) to bound the
    iteration, and each round rescales by max|w| — every step integer,
    so Spark and the unrolled DuckDB oracle produce bit-identical
    eigenvectors and projections. Output: ip = q·v (the raw grid dot),
    icp = n·ip − (Σq)·v (the n-scaled CENTERED coordinate).
    """
    emb = _qarr(load(spark, "embeddings", sf_dir))
    # scatter matrix: the UPPER TRIANGLE only (q_i·q_j ≡ q_j·q_i, so
    # the full 64×64 explode shuffled twice the rows for mirrored
    # values — round 6 halves the dominant explode+agg and mirrors
    # driver-side; identical integer sums land in every a[i][j])
    pairs = F.explode(
        F.expr(
            "flatten(transform(q, (x, i) -> "
            "transform(slice(q, i + 1, size(q) - i), (y, jr) -> "
            "struct(i AS d1, i + jr AS d2, x * y AS p))))"
        )
    )
    a_rows = (
        emb.select(pairs.alias("e"))
        .groupBy(F.col("e.d1").alias("d1"), F.col("e.d2").alias("d2"))
        .agg(F.sum("e.p").alias("s"))
        .collect()
    )
    b_rows = (
        emb.select(F.posexplode("q").alias("d", "qv"))
        .groupBy("d")
        .agg(F.sum("qv").alias("s"))
        .collect()
    )
    n = emb.count()
    a = [[0] * DIM for _ in range(DIM)]
    for r in a_rows:
        a[r["d1"]][r["d2"]] = r["s"]
        a[r["d2"]][r["d1"]] = r["s"]
    b = [0] * DIM
    for r in b_rows:
        b[r["d"]] = r["s"]
    m = [[n * a[i][j] - b[i] * b[j] for j in range(DIM)] for i in range(DIM)]
    dscale = max(1, max(abs(x) for row in m for x in row) // PCA_VSCALE)
    ms = [
        [(1 if x >= 0 else -1) * (abs(x) // dscale) for x in row]
        for row in m
    ]
    v = _power_iterate(ms, iters)
    bv = sum(b[d] * v[d] for d in range(DIM))

    vlit = "array(" + ", ".join(f"{x}L" for x in v) + ")"
    ip = F.expr(
        f"aggregate(zip_with(q, {vlit}, (x, s) -> x * s), 0L, "
        "(acc, x) -> acc + x)"
    )
    return (
        emb.select("vec_id", "label", ip.alias("ip"))
        .select(
            "vec_id",
            "label",
            "ip",
            (F.lit(n).cast("long") * F.col("ip") - F.lit(bv).cast("long")).alias(
                "icp"
            ),
        )
        .orderBy("vec_id")
    )


def pca_power_projection_sql(iters: int = PCA_ITERS) -> str:
    steps = []
    prev = "v0"
    for t in range(1, iters + 1):
        steps.append(
            f"w{t} AS MATERIALIZED (SELECT ms.d1 AS d, "
            f"sum(ms.s * v.val) AS w FROM ms JOIN {prev} v ON ms.d2 = v.d "
            f"GROUP BY ms.d1)"
        )
        steps.append(
            f"v{t} AS MATERIALIZED (SELECT d, "
            f"(CASE WHEN w >= 0 THEN 1 ELSE -1 END) * "
            f"((abs(w) * {PCA_VSCALE}) // greatest(1, (SELECT max(abs(w)) FROM w{t}))) "
            f"AS val FROM w{t})"
        )
        prev = f"v{t}"
    return f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS d,
         floor(unnest(embedding)::DOUBLE * {PCA_Q})::BIGINT AS q
  FROM embeddings
),
a AS (SELECT x.d AS d1, y.d AS d2, sum(x.q * y.q) AS s
      FROM qv x JOIN qv y USING (vec_id) GROUP BY x.d, y.d),
b AS (SELECT d, sum(q) AS s FROM qv GROUP BY d),
nn AS (SELECT count(DISTINCT vec_id) AS c FROM qv),
m AS (SELECT a.d1, a.d2,
             (SELECT c FROM nn) * a.s - ba.s * bb.s AS s
      FROM a JOIN b ba ON a.d1 = ba.d JOIN b bb ON a.d2 = bb.d),
dsc AS (SELECT greatest(1, max(abs(s)) // {PCA_VSCALE}) AS d FROM m),
ms AS MATERIALIZED (
  SELECT d1, d2,
         (CASE WHEN s >= 0 THEN 1 ELSE -1 END)
         * (abs(s) // (SELECT d FROM dsc)) AS s
  FROM m),
v0 AS (SELECT d1 AS d, {PCA_VSCALE}::BIGINT AS val FROM ms WHERE d2 = 0),
{', '.join(steps)},
bv AS (SELECT sum(b.s * v.val) AS x FROM b JOIN {prev} v USING (d)),
proj AS (
  SELECT q.vec_id, any_value(q.label) AS label,
         sum(q.q * v.val)::BIGINT AS ip
  FROM qv q JOIN {prev} v USING (d) GROUP BY q.vec_id
)
SELECT vec_id, label, ip,
       ((SELECT c FROM nn) * ip - (SELECT x FROM bv))::BIGINT AS icp
FROM proj ORDER BY vec_id
"""


def random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss reduction of every embedding to RP_K
    dimensions with a deterministic ±1 sign matrix (Achlioptas 2003) —
    the standard cheap pre-pass before LSH/IVF index builds (bucket in
    16 dims instead of 64; pairwise distances are preserved within
    1±ε whp). Entirely row-local: the sign matrix is an md5-derived
    literal baked into the plan, so the projection is a zero-shuffle
    map over the corpus — the embarrassingly-parallel shape that scales
    to any corpus by adding executors.

    Output: (vec_id, label, y0..y{RP_K-1}) with y_k = Σ_d ±q_d exactly
    (int64 on the PCA_Q grid)."""
    emb = _qarr(load(spark, "embeddings", sf_dir))
    cols = []
    for k in range(RP_K):
        signs = "array(" + ", ".join(
            f"{_jl_sign(k, d)}L" for d in range(DIM)
        ) + ")"
        cols.append(
            f"aggregate(zip_with(q, {signs}, (x, s) -> x * s), 0L, "
            f"(acc, x) -> acc + x) AS y{k}"
        )
    return emb.selectExpr("vec_id", "label", *cols).orderBy("vec_id")


def random_projection_sql() -> str:
    sign_vals = ", ".join(
        f"({k}, {d}, {_jl_sign(k, d)})"
        for k in range(RP_K)
        for d in range(DIM)
    )
    ycols = ", ".join(
        f"sum(CASE WHEN s.k = {k} THEN q.q * s.s END)::BIGINT AS y{k}"
        for k in range(RP_K)
    )
    return f"""
WITH qv AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS d,
         floor(unnest(embedding)::DOUBLE * {PCA_Q})::BIGINT AS q
  FROM embeddings
),
sgn(k, d, s) AS (VALUES {sign_vals})
SELECT q.vec_id, any_value(q.label) AS label, {ycols}
FROM qv q JOIN sgn s USING (d)
GROUP BY q.vec_id ORDER BY q.vec_id
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization of the embedding column
# ---------------------------------------------------------------------------

SQ_LEVELS = 255  # 8-bit code range 0..255


def scalar_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization of the embedding column
    (the standard 4× memory/IO compression serving-scale vector stores
    apply before ANN — FAISS SQ8, Lucene/Elasticsearch int8_hnsw) plus
    the per-vector reconstruction-error audit that decides whether SQ8
    is safe for a given corpus.

    Plan: ONE map-side (dim) min/max aggregate (64 rows → driver
    constant, the trained-quantizer pattern), then encode + decode +
    error fold as a single row-local pass — corpus touched twice, no
    joins, no windows.

    Integer-exact: codes are c = ((q − mn) · 255) div max(1, mx − mn)
    on the PCA_Q grid, reconstruction r = mn + (c · (mx − mn)) div 255,
    errors are exact int64 sums of |q − r| — all operands non-negative
    where divided, so Spark `div` ≡ DuckDB `//`."""
    emb = _qarr(load(spark, "embeddings", sf_dir))
    rng = (
        emb.select(F.posexplode("q").alias("d", "qv"))
        .groupBy("d")
        .agg(F.min("qv").alias("mn"), F.max("qv").alias("mx"))
        .collect()
    )
    mn = [0] * DIM
    mx = [0] * DIM
    for r in rng:
        mn[r["d"]], mx[r["d"]] = r["mn"], r["mx"]
    # c in 0..255; r = reconstruction; per-element |q - r|. Stated as a
    # SQL expr so the divisions are integer `div` (the Python `/`
    # operator is double division; floor(double) can flip an exact
    # integer quotient by an ulp)
    mnarr = "array(" + ", ".join(f"{x}L" for x in mn) + ")"
    sparr = "array(" + ", ".join(
        f"{max(1, mx[d] - mn[d])}L" for d in range(DIM)
    ) + ")"
    err = F.expr(
        f"zip_with(zip_with(q, {mnarr}, (x, m) -> x - m), {sparr}, "
        f"(s, w) -> abs(s - ((((s * {SQ_LEVELS}) div w) * w) div {SQ_LEVELS})))"
    )
    return (
        emb.select(
            "vec_id",
            "label",
            err.alias("e"),
        )
        .select(
            "vec_id",
            "label",
            F.aggregate(
                "e", F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("ierr_l1"),
            F.array_max("e").cast("long").alias("ierr_max"),
        )
        .orderBy("vec_id")
    )


def scalar_quantization_sql() -> str:
    return f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS d,
         floor(unnest(embedding)::DOUBLE * {PCA_Q})::BIGINT AS q
  FROM embeddings
),
rng AS (SELECT d, min(q) AS mn, greatest(1, max(q) - min(q)) AS w
        FROM qv GROUP BY d),
enc AS (
  SELECT q.vec_id, q.label,
         abs((q.q - r.mn)
             - ((((q.q - r.mn) * {SQ_LEVELS}) // r.w) * r.w) // {SQ_LEVELS})
           AS e
  FROM qv q JOIN rng r USING (d)
)
SELECT vec_id, any_value(label) AS label,
       sum(e)::BIGINT AS ierr_l1, max(e)::BIGINT AS ierr_max
FROM enc GROUP BY vec_id ORDER BY vec_id
"""
