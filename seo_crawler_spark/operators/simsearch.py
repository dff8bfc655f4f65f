"""Similarity search over the embeddings table.

* brute-force cosine top-k — the correctness baseline: query set ×
  corpus, JVM-side zip_with/aggregate arithmetic, TakeOrdered top-k.
* LSH-bucketed ANN — the scale path: 16 deterministic random-hyperplane
  signs (md5-derived ±1 planes, identical in the DuckDB oracle) bucket
  vectors; candidates = same-bucket or Hamming-1 buckets (multi-probe);
  exact cosine re-rank inside the candidate set. Recall < 1 by design,
  but fully deterministic, so the oracle matches exactly.

At 10^10 scale the LSH variant turns an O(n·q) scan into q bucket
lookups against a table partitioned by bucket id; the plane matrix is a
broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import MD5INT_SQL, md5int
from ..sources.tables import load

N_QUERIES = 10
TOP_K = 5
N_PLANES = 16
# fixed-point quantization for hyperplane dots: floor(v * SCALE) as int64
# makes the sign test an exact integer sum — order-independent, so Spark
# partitionings and the DuckDB oracle agree bit-for-bit (a double sum's
# near-zero dots can flip sign with accumulation order)
DOT_SCALE = 1_000_000


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v))
    # try_divide: a zero-norm vector's cosine is undefined — null here,
    # dropped by every consumer's threshold/rank predicate. Plain `/`
    # THROWS under ANSI mode, taking the whole job down on one
    # all-zeros embedding (a real failure mode for web-scale corpora:
    # empty docs embed to zeros). Identical results wherever norms > 0.
    return F.try_divide(dot, na * nb)


def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for the first N_QUERIES vec_ids."""
    emb = load(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("cid"))
        .withColumn("cos", F.round(_cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "cid", "cos", "rnk")
        .orderBy("qid", "rnk")
    )


ANN_BRUTE_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  -- DOUBLE[] cast: match Spark's double-accumulating cosine exactly
  -- (FLOAT[] would run list_cosine_similarity in single precision)
  SELECT q.qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]), 4) AS cos
  FROM q JOIN embeddings c ON q.qid <> c.vec_id
),
ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rnk
  FROM scored
)
SELECT qid, cid, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
ORDER BY qid, rnk
"""


def _plane_signs(spark: SparkSession, dim: int) -> DataFrame:
    """Deterministic ±1 hyperplane matrix: sign = parity of
    md5int('p<i>_d<j>') — reproducible in SQL, no RNG. Built from one
    flat range (p = id div dim, d = id mod dim) so no cross join ever
    appears in a consumer's plan."""
    return spark.range(N_PLANES * dim).select(
        (F.col("id") / dim).cast("int").alias("p"),
        (F.col("id") % dim).cast("int").alias("d"),
    ).select(
        "p",
        "d",
        (
            (md5int(F.concat(F.lit("p"), F.col("p"), F.lit("_d"), F.col("d"))) % 2) * 2
            - 1
        ).alias("sign"),
    )


def ann_lsh_bucketed(
    spark: SparkSession, sf_dir: str, dim: int | None = None
) -> DataFrame:
    """LSH bucket ids for every vector (the bucketing stage of the ANN
    index; deterministic, oracle-checkable). Bucket = 16-bit signature
    of hyperplane sign dots, computed in fixed-point integer space so
    the signature is independent of partitioning/accumulation order.

    ``dim`` is a table constant — pass it in production; when omitted, a
    single-int LIMIT 1 probe reads it (column-pruned, one row-group)."""
    emb = load(spark, "embeddings", sf_dir)
    if dim is None:
        dim = emb.select(F.size("embedding").alias("n")).limit(1).collect()[0]["n"]
    planes = _plane_signs(spark, dim)

    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "v")
    )
    q = F.floor(F.col("v").cast("double") * DOT_SCALE).cast("long")
    dots = (
        ex.join(F.broadcast(planes), "d")
        .groupBy("vec_id", "p")
        .agg(F.sum(q * F.col("sign")).alias("idot"))
    )
    return (
        dots.groupBy("vec_id")
        .agg(
            F.sum(
                # PySpark's shiftleft wrapper wants a literal bit count;
                # the SQL form accepts a column
                F.when(F.col("idot") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("bucket")
        )
        .orderBy("vec_id")
    )


def ann_lsh_bucketed_sql() -> str:
    h = MD5INT_SQL.format(c="('p' || p || '_d' || d)")
    return f"""
WITH dims AS (SELECT unnest(range(0, len((SELECT embedding FROM embeddings LIMIT 1)))) AS d),
planes AS (
  SELECT p, d, ({h} % 2) * 2 - 1 AS sign
  FROM (SELECT unnest(range(0, {N_PLANES})) AS p), dims
),
ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         unnest(embedding) AS v
  FROM embeddings
),
dots AS (
  SELECT ex.vec_id, planes.p,
         sum(floor(ex.v::DOUBLE * {DOT_SCALE})::BIGINT * planes.sign) AS idot
  FROM ex JOIN planes ON ex.d = planes.d
  GROUP BY ex.vec_id, planes.p
)
SELECT vec_id,
       sum(CASE WHEN idot > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
FROM dots GROUP BY vec_id ORDER BY vec_id
"""


N_CELLS = 16
N_PROBE = 4


def _int_dot(a, b):
    """Fixed-point integer dot — order-independent, so cell assignment
    is identical across Spark partitionings and the DuckDB oracle."""
    q = lambda x: F.floor(x.cast("double") * DOT_SCALE).cast("long")
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: q(x) * q(y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cell_assign_udf(centroids: list[tuple[int, list[float]]], n_probe: int = 1):
    """Production coarse quantizer: a vectorized (Arrow-batched) Pandas
    UDF mapping an embedding column to its ``n_probe`` nearest cell ids
    by fixed-point integer dot — bit-identical to the
    ``_int_dot``-over-``F.lit``-literals expression path and therefore
    to the DuckDB oracle, but O(1) plan size in the number of cells.

    The literal-expression path embeds n_cells × dim literals in the
    expression tree: fine as a 16-pivot oracle twin, fatal at the
    thousands of cells a SemDeDup/IVF index needs (k ∝ √N — Abbas et
    al. 2023) because codegen blows up. Here the centroid matrix rides
    in the UDF closure instead — pickled ONCE per executor (a few MB at
    k=10^4, dim=64), and each Arrow batch does one int64 matmul:
    floor(E·1e6) @ floor(C·1e6)ᵀ, |dot| ≤ dim·1e12 ≪ 2^63.

    Tie-break matches the expression path: max integer dot, then
    smallest cell id — centroids are sorted by cell id so a stable
    argsort on -dots resolves ties toward the smaller id.
    """
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    cents = sorted(centroids, key=lambda c: c[0])
    cids = np.asarray([c for c, _ in cents], dtype=np.int64)
    cq = np.floor(
        np.asarray([v for _, v in cents], dtype=np.float64) * DOT_SCALE
    ).astype(np.int64)
    p = min(n_probe, len(cents))

    # BLAS fast path: every fixed-point product and partial sum is an
    # integer; as long as the largest possible |dot| stays below 2^53
    # a float64 matmul is EXACT (every intermediate is an exactly-
    # representable integer, so accumulation order cannot matter) and
    # ~50× faster than numpy's non-BLAS int64 matmul. The bound is
    # re-checked per batch against the batch's own magnitudes; an
    # over-range batch falls back to the exact int64 matmul.
    cqf = cq.astype(np.float64)
    c_max = float(np.abs(cq).max()) if cq.size else 0.0
    dim = cq.shape[1] if cq.ndim == 2 else 0

    @pandas_udf(ArrayType(IntegerType()))
    def assign(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        e = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        q = np.floor(e * DOT_SCALE)
        if abs(q).max() * c_max * dim < 2.0**53:
            dots = (q @ cqf.T).astype(np.int64)
        else:
            dots = q.astype(np.int64) @ cq.T
        idx = np.argsort(-dots, axis=1, kind="stable")[:, :p]
        return pd.Series(list(cids[idx].astype(np.int32)))

    return assign


def pivot_centroids(
    emb: DataFrame, n_cells: int
) -> list[tuple[int, list[float]]]:
    """First ``n_cells`` vectors by vec_id as the coarse quantizer —
    deterministic (a float k-means mean is accumulation-order-dependent
    and would break oracle parity). A trained quantizer is likewise a
    driver-side constant; at k ∝ √N = 10^5 for 10^10 vectors this
    collect is ~50 MB, a dimension-sized driver constant."""
    return [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < n_cells)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]


def literal_cell_scores(cents: list[tuple[int, list[float]]]):
    """Oracle-twin quantizer: (idot, -cid) struct array with every
    centroid embedded as F.lit literals — array_max/sort_array break
    idot ties toward the smallest centroid id. Only viable for pivot-
    sized cell counts (n_cells × dim literals in the expression tree);
    the production path is :func:`cell_assign_udf`, which is
    bit-identical. Kept so tests can pin matmul ≡ literal ≡ DuckDB."""

    def scores(col):
        return F.array(
            *[
                F.struct(
                    _int_dot(col, F.array(*[F.lit(x) for x in cv])).alias("s"),
                    F.lit(-cid).alias("nc"),
                )
                for cid, cv in cents
            ]
        )

    return scores


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    n_probe: int = N_PROBE,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_cells: int = N_CELLS,
    quantizer: str = "matmul",
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize every vector to its
    nearest of ``n_cells`` pivot centroids, then answer each query by
    scanning only its n_probe closest cells with an exact cosine
    re-rank — the classic IVF-Flat layout (Jégou et al., PAMI 2011).

    Production passes a trained quantizer via ``centroids``
    ([(cell_id, vector), ...]) and skips the pivot collect entirely.
    The quantizer is a driver-side constant, so cell assignment is
    row-local (one Arrow-batched int64 matmul per batch —
    :func:`cell_assign_udf`; ``quantizer="literal"`` selects the
    F.lit expression twin for parity tests): NO shuffle until the
    (query_cell ⋈ index_cell) equi-join, and that join touches
    n_probe/n_cells of the corpus. At 10^10 vectors the index table is
    written partitioned by cell (k ∝ √N cells), so each query reads
    only its probed partitions.
    """
    emb = load(spark, "embeddings", sf_dir)
    cents = centroids if centroids is not None else pivot_centroids(emb, n_cells)

    if quantizer == "matmul":
        assign1 = cell_assign_udf(cents, 1)
        assign_p = cell_assign_udf(cents, n_probe)
        index = emb.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cv"),
            assign1(F.col("embedding")).getItem(0).alias("cell"),
        )
        q = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            assign_p(F.col("embedding")).alias("probes"),
        )
        probes = q.select("qid", "qv", F.explode("probes").alias("cell"))
    else:
        scores = literal_cell_scores(cents)
        index = emb.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cv"),
            (-F.array_max(scores(F.col("embedding"))).getField("nc")).alias("cell"),
        )
        q = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            F.slice(
                F.sort_array(scores(F.col("embedding")), asc=False), 1, n_probe
            ).alias("probes"),
        )
        probes = q.select("qid", "qv", F.explode("probes").alias("pr")).select(
            "qid", "qv", (-F.col("pr.nc")).alias("cell")
        )
    scored = (
        F.broadcast(probes)
        .join(index, "cell")
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("cos", F.round(_cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "cid", "cos", "rnk")
        .orderBy("qid", "rnk")
    )


def ann_ivf_topk_sql(n_probe: int = N_PROBE) -> str:
    return f"""
WITH cents AS (
  SELECT vec_id AS ccid, embedding AS cvec FROM embeddings
  WHERE vec_id < {N_CELLS}
),
ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d, unnest(embedding) AS v
  FROM embeddings
),
cex AS (
  SELECT ccid, generate_subscripts(cvec, 1) AS d, unnest(cvec) AS cv
  FROM cents
),
idots AS (
  SELECT ex.vec_id, cex.ccid,
         sum(floor(ex.v::DOUBLE * {DOT_SCALE})::BIGINT *
             floor(cex.cv::DOUBLE * {DOT_SCALE})::BIGINT) AS idot
  FROM ex JOIN cex ON ex.d = cex.d
  GROUP BY ex.vec_id, cex.ccid
),
cells AS (
  SELECT vec_id, ccid AS cell FROM (
    SELECT vec_id, ccid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY idot DESC, ccid ASC) AS rn
    FROM idots
  ) WHERE rn = 1
),
qprobes AS (
  SELECT vec_id AS qid, ccid AS cell FROM (
    SELECT vec_id, ccid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY idot DESC, ccid ASC) AS rn
    FROM idots WHERE vec_id < {N_QUERIES}
  ) WHERE rn <= {n_probe}
),
scored AS (
  SELECT p.qid, c.vec_id AS cid,
         round(list_cosine_similarity(qe.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS cos
  FROM qprobes p
  JOIN cells ON cells.cell = p.cell
  JOIN embeddings c ON c.vec_id = cells.vec_id AND c.vec_id <> p.qid
  JOIN embeddings qe ON qe.vec_id = p.qid
),
ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rnk
  FROM scored
)
SELECT qid, cid, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
ORDER BY qid, rnk
"""


# banding over the 16-plane signature for the near-dup candidate join —
# the SAME 4×4 split dedup_embedding_cosine uses; this variant adds
# hamming-1 multi-probe WITHIN each band
_ND_BANDS = 4
_ND_BAND_BITS = 4


def embedding_neardup_lsh(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.45,
    dim: int | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: banded hyperplane LSH with
    hamming-1 multi-probe per band — a candidate pair agrees on some
    band exactly OR within one flipped plane of it, then exact cosine
    verifies. Multi-probe exists because plain banding collapses at
    LOW thresholds: at cos≈0.5 the per-plane agreement is only ~0.66,
    so hamming-1-of-the-full-signature recall is ~1% (measured — the
    query came back empty) and exact 4-bit bands recover only ~40% of
    true pairs; probing each band's 4 one-bit variants lifts pair
    recall to ~0.97 at the cost of 5× candidate volume (drop the
    probes in a high-similarity regime). Deterministic (md5-derived
    planes), so recall is fixed and the DuckDB oracle matches exactly.

    Shuffle discipline: the candidate join carries ONLY (band, key,
    vec_id) — embeddings join in once, per surviving candidate pair,
    for the verify (not 5× through the probe explode)."""
    emb = load(spark, "embeddings", sf_dir)
    buckets = ann_lsh_bucketed(spark, sf_dir, dim=dim)
    mask = (1 << _ND_BAND_BITS) - 1
    band_key = lambda k: (
        F.shiftright(F.col("bucket"), k * _ND_BAND_BITS).bitwiseAND(F.lit(mask))
    )
    bands = buckets.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("band"), band_key(k).alias("key"))
                    for k in range(_ND_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "bk.band", "bk.key")
    probe = bands.select(
        "vec_id",
        "band",
        F.explode(
            F.array(
                F.col("key"),
                *[
                    F.col("key").bitwiseXOR(F.lit(1 << j))
                    for j in range(_ND_BAND_BITS)
                ],
            )
        ).alias("key"),
    )
    cand = (
        probe.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    va = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    vb = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .withColumn("cos", F.round(_cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
        .orderBy("a", "b")
    )


def embedding_neardup_lsh_sql(threshold: float = 0.45) -> str:
    base = ann_lsh_bucketed_sql().strip()
    inner = base[: base.rfind("ORDER BY")]
    ks = ", ".join(str(k) for k in range(_ND_BANDS))
    mask = (1 << _ND_BAND_BITS) - 1
    flips = ", ".join(str(1 << j) for j in range(_ND_BAND_BITS))
    return f"""
WITH bucketq AS ({inner}),
bands AS (
  SELECT vec_id, k AS band,
         (bucket >> (k * {_ND_BAND_BITS})) & {mask} AS key
  FROM bucketq, (SELECT unnest([{ks}]) AS k)
),
probe AS (
  SELECT vec_id, band,
         unnest([key] || list_transform([{flips}], m -> xor(key, m))) AS key
  FROM bands
),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM probe x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
)
SELECT c.a, c.b,
       round(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 4) AS cos
FROM cand c JOIN embeddings x ON c.a = x.vec_id JOIN embeddings y ON c.b = y.vec_id
WHERE round(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 4) >= {threshold}
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized ANN — the 100 TB memory path
# ---------------------------------------------------------------------------

PQ_M = 8   # subspaces
PQ_KS = 16  # codes per subspace codebook
PQ_R = 50  # ADC shortlist size re-ranked exactly (IVFADC+R)


def pq_codebooks(
    emb: DataFrame, dim: int, m: int = PQ_M, ks: int = PQ_KS
) -> list[list[tuple[int, list[int]]]]:
    """Deterministic pivot codebooks for product quantization: codebook
    ``m``, entry ``j`` = the m-th subvector of vector vec_id=j, in
    fixed-point int64 (floor(v * DOT_SCALE)). One codebook per
    subspace, ks entries each — a driver constant of m × ks × (dim/m)
    ints (== ks full vectors, same size class as pivot_centroids).

    A TRAINED codebook is :func:`kmeans_train` run per subspace over
    the sub-vector columns (same driver-constant shape); pivots keep
    the DuckDB oracle expressible and the whole pipeline integer-exact.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by {m} subspaces")
    sub = dim // m
    rows = (
        emb.filter(F.col("vec_id") < ks)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * DOT_SCALE).cast("long"),
            ).alias("qv"),
        )
        .orderBy("vec_id")
        .collect()
    )
    return [
        [
            (int(r["vec_id"]), [int(x) for x in r["qv"][mm * sub : (mm + 1) * sub]])
            for r in rows
        ]
        for mm in range(m)
    ]


def pq_encode_udf(codebooks: list[list[tuple[int, list[int]]]]):
    """Product-quantization encoder: an Arrow-batched Pandas UDF mapping
    an embedding column to its M per-subspace code ids (nearest
    codebook entry by exact fixed-point squared distance, ties → the
    smallest code id — the same dist/id tie-break as
    :func:`_sq_assign_udf`). Codebooks ride in the closure (pickled
    once per executor); each batch does one int64 matmul per subspace
    with the usual < 2^53 BLAS float64 fast path. Encoding is
    row-local — codes for 10^10 vectors cost zero shuffle, and the
    stored index is M bytes-ish per vector instead of dim floats: the
    reason PQ is the memory path at scale (Jégou et al., PAMI 2011)."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    cbs = []
    for entries in codebooks:
        ent = sorted(entries, key=lambda c: c[0])
        cq = np.asarray([v for _, v in ent], dtype=np.int64)
        cc = (cq.astype(object) ** 2).sum(axis=1).astype(np.int64)  # exact
        cbs.append((np.asarray([j for j, _ in ent], dtype=np.int64), cq, cc))
    sub = cbs[0][1].shape[1]
    m = len(cbs)
    c_max = max(float(np.abs(cq).max()) for _, cq, _ in cbs)
    cc_max = max(float(cc.max()) for _, _, cc in cbs)

    @pandas_udf(ArrayType(IntegerType()))
    def encode(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        e = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        q = np.floor(e * DOT_SCALE)
        exact_f64 = (
            2.0 * abs(q).max() * c_max * sub + cc_max < 2.0**53
        )
        out = np.empty((len(col), m), dtype=np.int32)
        for mm, (jids, cq, cc) in enumerate(cbs):
            qm = q[:, mm * sub : (mm + 1) * sub]
            if exact_f64:
                score = cc.astype(np.float64) - 2.0 * (qm @ cq.astype(np.float64).T)
            else:
                score = cc - 2 * (qm.astype(np.int64) @ cq.T)
            # argmin → FIRST minimum; jids ascend, so ties → smaller id
            out[:, mm] = jids[np.argmin(score, axis=1)]
        return pd.Series(list(out))

    return encode


def ann_ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    n_probe: int = N_PROBE,
    dim: int | None = None,
    shortlist: int = PQ_R,
) -> DataFrame:
    """IVF-PQ ANN with exact re-rank — IVFADC+R (Jégou et al., PAMI
    2011): coarse cells narrow the candidate set (same IVF layout as
    :func:`ann_ivf_topk`), candidates are scored by ASYMMETRIC
    DISTANCE COMPUTATION against their product-quantization codes,
    and only the per-query top-``shortlist`` ADC survivors touch raw
    embeddings for an exact cosine re-rank. At 10^10 vectors the
    scanned index is M code-bytes per vector instead of dim floats —
    the difference between an index that fits in cluster memory and
    one that doesn't — while the exact stage reads ``shortlist`` rows
    per query (measured at bench scale: ADC-only top-k recall is
    ~0.3–0.5 under any codebook at these rates; the +R re-rank lifts
    it to ~0.9, which is why the refinement stage is part of the
    published design, not an optimization).

    Plan shape: codes + cells are row-local Arrow-batched matmuls
    (zero shuffle); the per-query ADC lookup table (q × M × KS int
    dots) is a broadcast built from one tiny join; candidate scoring
    is probe-cell equi-join → M-way code explode → broadcast LUT join
    → one map-side-combined sum; the re-rank joins embeddings for
    R × queries ids only. ADC arithmetic is fixed-point int64, so the
    shortlist is bit-identical to the DuckDB oracle."""
    emb = load(spark, "embeddings", sf_dir)
    if dim is None:
        dim = emb.select(F.size("embedding").alias("n")).limit(1).collect()[0]["n"]
    sub = dim // PQ_M
    cbs = pq_codebooks(emb, dim)
    cents = pivot_centroids(emb, N_CELLS)
    encode = pq_encode_udf(cbs)
    assign1 = cell_assign_udf(cents, 1)
    assign_p = cell_assign_udf(cents, n_probe)

    index = emb.select(
        F.col("vec_id").alias("cid"),
        assign1(F.col("embedding")).getItem(0).alias("cell"),
        encode(F.col("embedding")).alias("codes"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * DOT_SCALE).cast("long"),
        ).alias("qv"),
        assign_p(F.col("embedding")).alias("probes"),
    )

    # ADC lookup table: idot(query subvector m, codebook[m][j]) for all
    # (qid, m, j) — N_QUERIES × PQ_M × PQ_KS rows, built from one join
    # against the codebook rows (a driver-constant dimension table)
    cb_rows = [
        (mm, j, d, int(v))
        for mm, entries in enumerate(cbs)
        for j, vec in entries
        for d, v in enumerate(vec)
    ]
    cbdf = spark.createDataFrame(cb_rows, "m int, j int, dd int, cv long")
    qex = q.select("qid", F.posexplode("qv").alias("d", "v")).select(
        "qid",
        (F.col("d") / sub).cast("int").alias("m"),
        (F.col("d") % sub).cast("int").alias("dd"),
        "v",
    )
    lut = (
        qex.join(F.broadcast(cbdf), ["m", "dd"])
        .groupBy("qid", "m", "j")
        .agg(F.sum(F.col("v") * F.col("cv")).alias("pdot"))
    )

    probes = q.select("qid", F.explode("probes").alias("cell"))
    adc = (
        F.broadcast(probes)
        .join(index, "cell")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.posexplode("codes").alias("m", "j"))
        .join(F.broadcast(lut), ["qid", "m", "j"])
        .groupBy("qid", "cid")
        .agg(F.sum("pdot").alias("adot"))
    )
    ws = Window.partitionBy("qid").orderBy(F.desc("adot"), F.asc("cid"))
    short = adc.withColumn("srn", F.row_number().over(ws)).filter(
        F.col("srn") <= shortlist
    )

    # exact re-rank of the shortlist: R rows per query touch embeddings
    qe = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    ce = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    rer = (
        short.join(qe, "qid")
        .join(ce, "cid")
        .withColumn("cos", F.round(_cosine(F.col("qe"), F.col("ce")), 4))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        rer.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "cid", "cos", "rnk")
        .orderBy("qid", "rnk")
    )


def ann_ivfpq_topk_sql(n_probe: int = N_PROBE, shortlist: int = PQ_R) -> str:
    """DuckDB twin: identical pivot codebooks, identical fixed-point
    code assignment (dist, j tie-break), identical integer ADC sum —
    so the shortlist matches exactly; the re-rank is the same
    double-cosine convention every ANN oracle here uses."""
    return f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * {DOT_SCALE})::BIGINT) AS qv
  FROM embeddings
),
ex AS MATERIALIZED (
  SELECT vec_id,
         ((generate_subscripts(qv, 1) - 1) // (len(qv) // {PQ_M}))::INT AS m,
         ((generate_subscripts(qv, 1) - 1) % (len(qv) // {PQ_M}))::INT AS dd,
         unnest(qv) AS v
  FROM qv
),
cbx AS MATERIALIZED (
  SELECT m, vec_id::INT AS j, dd, v AS cv FROM ex WHERE vec_id < {PQ_KS}
),
dists AS (
  SELECT e.vec_id, e.m, c.j,
         sum((e.v - c.cv) * (e.v - c.cv)) AS dist
  FROM ex e JOIN cbx c ON e.m = c.m AND e.dd = c.dd
  GROUP BY e.vec_id, e.m, c.j
),
codes AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT vec_id, m, j,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, j) AS rn
    FROM dists
  ) WHERE rn = 1
),
lut AS (
  SELECT e.vec_id AS qid, c.m, c.j, sum(e.v * c.cv)::BIGINT AS pdot
  FROM ex e JOIN cbx c ON e.m = c.m AND e.dd = c.dd
  WHERE e.vec_id < {N_QUERIES}
  GROUP BY e.vec_id, c.m, c.j
),
cents AS (SELECT vec_id AS ccid, qv AS cvec FROM qv WHERE vec_id < {N_CELLS}),
cex AS (SELECT ccid, generate_subscripts(cvec, 1) AS d, unnest(cvec) AS cv FROM cents),
fex AS (SELECT vec_id, generate_subscripts(qv, 1) AS d, unnest(qv) AS v FROM qv),
idots AS (
  SELECT fex.vec_id, cex.ccid, sum(fex.v * cex.cv) AS idot
  FROM fex JOIN cex ON fex.d = cex.d
  GROUP BY fex.vec_id, cex.ccid
),
cells AS (
  SELECT vec_id, ccid AS cell FROM (
    SELECT vec_id, ccid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY idot DESC, ccid ASC) AS rn
    FROM idots
  ) WHERE rn = 1
),
qprobes AS (
  SELECT vec_id AS qid, ccid AS cell FROM (
    SELECT vec_id, ccid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY idot DESC, ccid ASC) AS rn
    FROM idots WHERE vec_id < {N_QUERIES}
  ) WHERE rn <= {n_probe}
),
adc AS (
  SELECT p.qid, cells.vec_id AS cid, sum(lut.pdot)::BIGINT AS adot
  FROM qprobes p
  JOIN cells ON cells.cell = p.cell AND cells.vec_id <> p.qid
  JOIN codes ON codes.vec_id = cells.vec_id
  JOIN lut ON lut.qid = p.qid AND lut.m = codes.m AND lut.j = codes.code
  GROUP BY p.qid, cells.vec_id
),
short AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY adot DESC, cid ASC) AS srn
    FROM adc
  ) WHERE srn <= {shortlist}
),
rer AS (
  SELECT s.qid, s.cid,
         round(list_cosine_similarity(qe.embedding::DOUBLE[],
                                      ce.embedding::DOUBLE[]), 4) AS cos
  FROM short s
  JOIN embeddings qe ON qe.vec_id = s.qid
  JOIN embeddings ce ON ce.vec_id = s.cid
),
ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rnk
  FROM rer
)
SELECT qid, cid, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
ORDER BY qid, rnk
"""


# ---------------------------------------------------------------------------
# distributed k-means — trains the coarse quantizer for IVF / SemDeDup
# ---------------------------------------------------------------------------

KM_K = 8
KM_ITERS = 3


def _sq_assign_udf(cents_q: list[tuple[int, list[int]]]):
    """Nearest-centroid assignment (squared Euclidean) over FIXED-POINT
    integer vectors — the training-time twin of :func:`cell_assign_udf`
    (which maximizes dot product at query time): one Arrow-batched
    matmul per batch, centroid matrix in the closure, ties broken
    toward the smallest cell id. All arithmetic is exact integer
    (dist = ||q||^2 - 2 q.C + ||C||^2; the row-constant ||q||^2 is
    dropped), so assignment is bit-identical across Spark
    partitionings and the DuckDB oracle. BLAS float64 fast path under
    the same < 2^53 magnitude bound as cell_assign_udf."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import LongType

    cents = sorted(cents_q, key=lambda c: c[0])
    cids = np.asarray([c for c, _ in cents], dtype=np.int64)
    cq = np.asarray([v for _, v in cents], dtype=np.int64)
    cc = (cq.astype(object) ** 2).sum(axis=1).astype(np.int64)  # exact
    cqf = cq.astype(np.float64)
    c_max = float(np.abs(cq).max()) if cq.size else 0.0
    dim = cq.shape[1] if cq.ndim == 2 else 0

    @pandas_udf(LongType())
    def assign(col: pd.Series) -> pd.Series:
        # input column is the ALREADY-QUANTIZED int64 `qv` array — do
        # not re-scale (cell_assign_udf, by contrast, takes raw floats)
        if len(col) == 0:
            return pd.Series([], dtype="int64")
        q = np.stack([np.asarray(v, dtype=np.int64) for v in col])
        if 2.0 * abs(q).max() * c_max * dim < 2.0**53:
            score = cc.astype(np.float64) - 2.0 * (
                q.astype(np.float64) @ cqf.T
            )
            score = score.astype(np.int64)
        else:
            score = cc - 2 * (q @ cq.T)
        # np.argmin returns the FIRST minimum; cids are ascending, so
        # ties resolve to the smallest cell id (ORDER BY dist, cid)
        return pd.Series(cids[np.argmin(score, axis=1)])

    return assign


def kmeans_train(
    emb: DataFrame, k: int = KM_K, iters: int = KM_ITERS
) -> list[tuple[int, list[int]]]:
    """Distributed Lloyd's k-means over the embeddings table in exact
    fixed-point integer arithmetic — how the ``centroids=`` quantizer
    of :func:`ann_ivf_topk` / ``semdedup`` gets TRAINED at corpus
    scale (pivot_centroids is the untrained fallback).

    Every step is deterministic in any partitioning, so training is
    reproducible cross-engine (a float k-means mean depends on
    accumulation order and can flip assignments):

    * assignment — row-local Arrow-batched integer matmul
      (:func:`_sq_assign_udf`), zero shuffle;
    * update — posexplode to (cell, dim) and ONE map-side-combined
      sum/count aggregate (k x dim result rows), then the new centroid
      is the exact integer floor-mean computed driver-side — the same
      k-row-per-iteration driver constant every distributed k-means
      (incl. Spark MLlib's) collects;
    * empty cells keep their previous centroid.

    Init = the first k vectors by vec_id (deterministic; k-means|| is
    the seeding upgrade at 10^10 rows and changes only this step).
    Returns [(cell_id, fixed-point int64 vector), ...]; divide by
    DOT_SCALE via :func:`kmeans_centroids_float` to feed the
    ``centroids=`` APIs."""
    base = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * DOT_SCALE).cast("long"),
        ).alias("qv"),
    ).localCheckpoint(eager=True)  # reused iters+1 times
    cents = [
        (r["vec_id"], [int(x) for x in r["qv"]])
        for r in base.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]
    for _ in range(iters):
        assign = _sq_assign_udf(cents)
        sums = (
            base.select(assign(F.col("qv")).alias("cell"), "qv")
            .select("cell", F.posexplode("qv").alias("p", "v"))
            .groupBy("cell", "p")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = {}
        for r in sums:
            # python // floors — mirrored in SQL by the explicit
            # floor-div adjustment (DuckDB // truncates toward zero)
            new.setdefault(r["cell"], {})[r["p"]] = r["s"] // r["n"]
        cents = [
            (
                cid,
                [new[cid][p] for p in range(len(old))]
                if cid in new
                else old,
            )
            for cid, old in cents
        ]
    return cents


def kmeans_centroids_float(
    cents: list[tuple[int, list[int]]]
) -> list[tuple[int, list[float]]]:
    """Adapter to the ``centroids=`` interface of ann_ivf_topk /
    semdedup, which re-quantize via floor(v * DOT_SCALE): (cval + 0.5)
    / DOT_SCALE floors back to EXACTLY cval (cval/DOT_SCALE alone can
    round below the integer and floor to cval - 1)."""
    return [(cid, [(v + 0.5) / DOT_SCALE for v in vec]) for cid, vec in cents]


def kmeans_quantizer(
    spark: SparkSession, sf_dir: str, k: int = KM_K, iters: int = KM_ITERS
) -> DataFrame:
    """Registered query: train the k-means quantizer and report it —
    one row per (cell, dimension) with the fixed-point centroid value
    plus the cell's final population. Assignment UDF is bit-identical
    to the oracle's unrolled-CTE Lloyd iterations."""
    emb = load(spark, "embeddings", sf_dir)
    cents = kmeans_train(emb, k, iters)
    assign = _sq_assign_udf(cents)
    counts = (
        emb.select(
            assign(
                F.transform(
                    "embedding",
                    lambda x: F.floor(x.cast("double") * DOT_SCALE).cast(
                        "long"
                    ),
                )
            ).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    rows = spark.createDataFrame(
        [
            (cid, d + 1, int(v))
            for cid, vec in cents
            for d, v in enumerate(vec)
        ],
        "cell long, d int, cval long",
    )
    return (
        rows.join(counts, "cell", "left")
        .select(
            "cell",
            "d",
            "cval",
            F.coalesce("n_vecs", F.lit(0).cast("long")).alias("n_vecs"),
        )
        .orderBy("cell", "d")
    )


def _lloyd_ctes(k: int, iters: int) -> str:
    """Shared unrolled-Lloyd CTE prefix: quantize → k iterations →
    final assignment ``fw`` (vec_id, cid, rn; rn = 1 is the winning
    cell) and final centroids ``c{iters}`` — exact integer twin of
    kmeans_train (same fixed-point quantization, same dist/cid
    tie-break, same floor-mean, same empty-cell keep-old). Reused by
    kmeans_quantizer_sql and cluster_balanced_sample_sql."""
    steps = []
    prev = "c0"
    for i in range(1, iters + 1):
        steps.append(
            # MATERIALIZED: each step is referenced by the next; DuckDB
            # would otherwise inline and re-run the whole prefix
            f"""a{i} AS MATERIALIZED (
  SELECT q.vec_id, q.qv, c.cid,
         list_sum(list_transform(range(1, len(q.qv) + 1),
                  j -> (q.qv[j] - c.cv[j]) * (q.qv[j] - c.cv[j]))) AS dist
  FROM q, {prev} c),
w{i} AS (SELECT vec_id, qv, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         FROM a{i}),
m{i} AS (SELECT cell, p, sum(v) AS s, count(*) AS n FROM (
   SELECT cid AS cell, generate_subscripts(qv, 1) AS p, unnest(qv) AS v
   FROM w{i} WHERE rn = 1) GROUP BY cell, p),
c{i} AS MATERIALIZED (
  SELECT pv.cid, coalesce(nm.cv, pv.cv) AS cv FROM {prev} pv LEFT JOIN (
    SELECT cell AS cid,
           list((s // n) - CASE WHEN s % n <> 0 AND s < 0 THEN 1 ELSE 0 END
                ORDER BY p) AS cv
    FROM m{i} GROUP BY cell) nm ON pv.cid = nm.cid)"""
        )
        prev = f"c{i}"
    return f"""q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * {DOT_SCALE})::BIGINT) AS qv
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {k}),
{', '.join(steps)},
fa AS (
  SELECT q.vec_id, c.cid,
         list_sum(list_transform(range(1, len(q.qv) + 1),
                  j -> (q.qv[j] - c.cv[j]) * (q.qv[j] - c.cv[j]))) AS dist
  FROM q, {prev} c),
fw AS (SELECT vec_id, cid,
       row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       FROM fa)"""


def kmeans_quantizer_sql(k: int = KM_K, iters: int = KM_ITERS) -> str:
    return f"""
WITH {_lloyd_ctes(k, iters)},
cnt AS (SELECT cid AS cell, count(*) AS n_vecs FROM fw WHERE rn = 1 GROUP BY cid),
fx AS (SELECT cid, generate_subscripts(cv, 1) AS d, unnest(cv) AS cval
       FROM c{iters})
SELECT fx.cid AS cell, fx.d::INT AS d, fx.cval::BIGINT AS cval,
       coalesce(cnt.n_vecs, 0) AS n_vecs
FROM fx LEFT JOIN cnt ON fx.cid = cnt.cell
ORDER BY cell, d
"""


# cluster-balanced sampling: per-cell keep quota over the trained cells
CBS_QUOTA = 16
CBS_SALT = "cbs|"


def cluster_balanced_sample(
    spark: SparkSession,
    sf_dir: str,
    k: int = KM_K,
    iters: int = KM_ITERS,
    quota: int = CBS_QUOTA,
) -> DataFrame:
    """Cluster-balanced (diversity) sampling — the topic-rebalance step
    of an embedding-curated corpus (the cluster-quota selection used by
    DataComp-style pipelines and SemDeDup §4's cluster framing): train
    the k-means quantizer, assign every vector to its cell ROW-LOCALLY
    (Arrow-batched integer matmul, zero shuffle), then keep a fixed
    per-cell quota chosen in salted-md5 order — a deterministic
    "uniform at random within cell" that both engines reproduce. Output
    is every vector with its cell, its within-cell rank, and the kept
    verdict, so downstream joins can filter `kept = 1`.

    Scale shape: the only shuffle is the per-cell window, and cells are
    ~balanced by the k-means objective (k ∝ √N keeps cell size ~√N; a
    skewed cell caps at quota via the same bottom-k-sketch swap
    sampling.sample_bottomk ships — rank only the quota-smallest hashes
    per cell instead of sorting whole cells)."""
    emb = load(spark, "embeddings", sf_dir)
    cents = kmeans_train(emb, k, iters)
    assign = _sq_assign_udf(cents)
    qv = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * DOT_SCALE).cast("long"),
    )
    cells = emb.select(
        "vec_id",
        assign(qv).alias("cell"),
        md5int(
            F.concat(F.lit(CBS_SALT), F.col("vec_id").cast("string"))
        ).alias("h"),
    )
    w = Window.partitionBy("cell").orderBy("h", "vec_id")
    return (
        cells.withColumn("pos", F.row_number().over(w))
        .select(
            "vec_id",
            "cell",
            F.col("pos").cast("long").alias("pos"),
            (F.col("pos") <= quota).cast("long").alias("kept"),
        )
        .orderBy("vec_id")
    )


def cluster_balanced_sample_sql(
    k: int = KM_K, iters: int = KM_ITERS, quota: int = CBS_QUOTA
) -> str:
    h = MD5INT_SQL.format(c=f"'{CBS_SALT}' || vec_id::VARCHAR")
    return f"""
WITH {_lloyd_ctes(k, iters)},
hh AS (SELECT vec_id, cid AS cell, {h} AS h FROM fw WHERE rn = 1),
sel AS (SELECT vec_id, cell,
               row_number() OVER (PARTITION BY cell ORDER BY h, vec_id) AS pos
        FROM hh)
SELECT vec_id, cell, pos::BIGINT AS pos, (pos <= {quota})::BIGINT AS kept
FROM sel ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# cross-lingual bitext mining (margin-based alignment)
# ---------------------------------------------------------------------------

BTX_SRC_LANG = "en"   # source side of the mined pairs
BTX_BANDS = 4         # 16-bit signature split 4 bands x 4 bits (the
BTX_BAND_BITS = 4     # dedup_embedding_cosine split - weak-similarity data)
BTX_KNN = 4           # k of the margin's k-NN denominator
BTX_MARGIN_PCT = 105  # kept iff margin >= 1.05, stated on integers
ICOS_SCALE = 10_000   # cosine -> int grid: icos = floor(cos * 1e4)


def bitext_mining(
    spark: SparkSession,
    sf_dir: str,
    src_lang: str = BTX_SRC_LANG,
    knn: int = BTX_KNN,
    margin_pct: int = BTX_MARGIN_PCT,
) -> DataFrame:
    """Margin-based cross-lingual bitext mining (Artetxe & Schwenk
    2019's ratio margin, the CCMatrix/LASER mining rule): for every
    source-language document, score each candidate target-language
    document by cos(x,y) normalized by the average cosine of each
    side's k nearest neighbours — margin = 2*cos(x,y) /
    (avg_kNN(x) + avg_kNN(y)) — and keep the forward-best target per
    (source doc, target lang) when the margin clears a threshold. The
    margin denominator calibrates away "hub" vectors that are close to
    everything, which raw-cosine mining mistakes for translations.

    Candidates come from the SAME banded hyperplane-LSH signature as
    :func:`dedup_embedding_cosine` (per-(band,key) equi-joins — the
    only corpus-scale shuffle), exactly how production miners use an
    ANN index both for candidates and for the k-NN denominator; the
    k-NN average is computed over each side's candidate set. Per-pair
    cosine is derived from exact int64 fixed-point dots and norms
    (floor(v*1e6) grid), then floored onto a 1e4 integer grid
    (icos) — every downstream sum/verdict is integer, so results are
    independent of partitioning and bit-identical to the DuckDB
    oracle; the reported margin is one division of two int64-derived
    doubles (the lm_perplexity discipline). The keep verdict is stated
    on integers: 100*mnum >= margin_pct*mden. `mutual` flags pairs
    where the target's best source is this source (the
    mutual-best-candidate signal CCMatrix filters on).

    Scale shape: band equi-join -> bounded per-vector candidate sets;
    two window ranks + two aggs partitioned by source/target vector
    (partition size = candidate count, bounded by band collisions);
    zero all-pairs joins anywhere. Output: one row per (src, tgt_lang)
    forward-best candidate with kept/mutual integer verdicts."""
    docs = load(spark, "documents", sf_dir).select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    emb = load(spark, "embeddings", sf_dir)
    buckets = ann_lsh_bucketed(spark, sf_dir).join(docs, "vec_id")
    mask = (1 << BTX_BAND_BITS) - 1
    bands = buckets.select(
        "vec_id",
        "lang",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright(F.col("bucket"), k * BTX_BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for k in range(BTX_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "lang", "bk.band", "bk.key")
    src_b = bands.filter(F.col("lang") == src_lang).select(
        F.col("vec_id").alias("src"), "band", "key"
    )
    tgt_b = bands.filter(F.col("lang") != src_lang).select(
        F.col("vec_id").alias("tgt"), F.col("lang").alias("tgt_lang"), "band", "key"
    )
    cand = src_b.join(tgt_b, ["band", "key"]).select("src", "tgt", "tgt_lang").distinct()

    qarr = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * DOT_SCALE).cast("long")
    )
    norms = (
        emb.select(
            "vec_id",
            F.aggregate(
                qarr, F.lit(0).cast("long"), lambda acc, v: acc + v * v
            ).alias("inorm"),
        )
        # zero-norm guard: an all-zeros embedding (empty doc) has no
        # cosine; drop it here exactly as the oracle's WHERE inorm > 0
        .filter(F.col("inorm") > 0)
        # reused by both the src and tgt join below
        .localCheckpoint(eager=True)
    )
    # pre-quantized int64 arrays per vector (one transform each) — the
    # pair stage then does one zip_with multiply-sum per candidate
    # instead of re-flooring both vectors inside every pair (measured
    # 2× the pair-stage cost in semdedup's identical pattern)
    ea = emb.select(F.col("vec_id").alias("src"), qarr.alias("qa"))
    eb = emb.select(F.col("vec_id").alias("tgt"), qarr.alias("qb"))
    pairs = (
        cand.join(ea, "src")
        .join(eb, "tgt")
        .withColumn(
            "idot",
            F.aggregate(
                F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
        .join(norms.select(F.col("vec_id").alias("src"), F.col("inorm").alias("na")), "src")
        .join(norms.select(F.col("vec_id").alias("tgt"), F.col("inorm").alias("nb")), "tgt")
        .select(
            "src",
            "tgt",
            "tgt_lang",
            # same op order as the SQL: idot / sqrt(na) / sqrt(nb) * 1e4
            # -- each step an IEEE-exact op on int64-derived doubles, so
            # the floor lands on the identical integer in both engines
            F.floor(
                F.col("idot").cast("double")
                / F.sqrt(F.col("na").cast("double"))
                / F.sqrt(F.col("nb").cast("double"))
                * F.lit(float(ICOS_SCALE))
            )
            .cast("long")
            .alias("icos"),
        )
        # feeds two windows, two aggs, and the final join
        .localCheckpoint(eager=True)
    )
    ws = Window.partitionBy("src", "tgt_lang").orderBy(F.desc("icos"), F.asc("tgt"))
    wt = Window.partitionBy("tgt").orderBy(F.desc("icos"), F.asc("src"))
    r = (
        pairs.withColumn("rs", F.row_number().over(ws))
        .withColumn("rt", F.row_number().over(wt))
        .localCheckpoint(eager=True)
    )
    srcnn = r.filter(F.col("rs") <= knn).groupBy("src", "tgt_lang").agg(
        F.sum("icos").alias("ssum"), F.count(F.lit(1)).alias("scnt")
    )
    tgtnn = r.filter(F.col("rt") <= knn).groupBy("tgt").agg(
        F.sum("icos").alias("tsum"), F.count(F.lit(1)).alias("tcnt")
    )
    scored = (
        r.join(srcnn, ["src", "tgt_lang"])
        .join(tgtnn, "tgt")
        .withColumn("mnum", F.lit(2) * F.col("icos") * F.col("scnt") * F.col("tcnt"))
        .withColumn(
            "mden", F.col("ssum") * F.col("tcnt") + F.col("tsum") * F.col("scnt")
        )
        .filter(F.col("mden") > 0)
        .withColumn("margin", F.col("mnum").cast("double") / F.col("mden").cast("double"))
    )
    wf = Window.partitionBy("src", "tgt_lang").orderBy(F.desc("margin"), F.asc("tgt"))
    wr = Window.partitionBy("tgt").orderBy(F.desc("margin"), F.asc("src"))
    best = scored.withColumn("fwd", F.row_number().over(wf)).withColumn(
        "rev", F.row_number().over(wr)
    )
    return (
        best.filter(F.col("fwd") == 1)
        .select(
            "src",
            "tgt",
            "tgt_lang",
            "icos",
            "margin",
            (F.lit(100) * F.col("mnum") >= F.lit(margin_pct) * F.col("mden"))
            .cast("long")
            .alias("kept"),
            (F.col("rev") == 1).cast("long").alias("mutual"),
        )
        .orderBy("src", "tgt_lang")
    )


def bitext_mining_sql(
    src_lang: str = BTX_SRC_LANG,
    knn: int = BTX_KNN,
    margin_pct: int = BTX_MARGIN_PCT,
) -> str:
    base = ann_lsh_bucketed_sql().strip()
    inner = base[: base.rfind("ORDER BY")]
    ks = ", ".join(str(k) for k in range(BTX_BANDS))
    mask = (1 << BTX_BAND_BITS) - 1
    return f"""
WITH bucketq AS ({inner}),
bands AS (
  SELECT b.vec_id, l.lang, k AS band, (bucket >> (k * {BTX_BAND_BITS})) & {mask} AS key
  FROM bucketq b JOIN (SELECT doc_id, lang FROM documents) l ON b.vec_id = l.doc_id,
       (SELECT unnest([{ks}]) AS k)
),
cand AS (
  SELECT DISTINCT x.vec_id AS src, y.vec_id AS tgt, y.lang AS tgt_lang
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
  WHERE x.lang = '{src_lang}' AND y.lang <> '{src_lang}'
),
pex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS d,
               floor(unnest(embedding)::DOUBLE * {DOT_SCALE})::BIGINT AS q
        FROM embeddings),
norms AS (SELECT vec_id, sum(q * q) AS inorm FROM pex GROUP BY 1),
pdots AS (SELECT c.src, c.tgt, c.tgt_lang, sum(a.q * b.q) AS idot
          FROM cand c JOIN pex a ON a.vec_id = c.src
                      JOIN pex b ON b.vec_id = c.tgt AND a.d = b.d
          GROUP BY 1, 2, 3),
pairs AS (SELECT d.src, d.tgt, d.tgt_lang,
                 floor(d.idot::DOUBLE / sqrt(na.inorm::DOUBLE)
                       / sqrt(nb.inorm::DOUBLE) * {ICOS_SCALE})::BIGINT AS icos
          FROM pdots d JOIN norms na ON na.vec_id = d.src
                       JOIN norms nb ON nb.vec_id = d.tgt
          WHERE na.inorm > 0 AND nb.inorm > 0),
r AS (SELECT *,
        row_number() OVER (PARTITION BY src, tgt_lang ORDER BY icos DESC, tgt) AS rs,
        row_number() OVER (PARTITION BY tgt ORDER BY icos DESC, src) AS rt
      FROM pairs),
srcnn AS (SELECT src, tgt_lang, sum(icos) AS ssum, count(*) AS scnt
          FROM r WHERE rs <= {knn} GROUP BY 1, 2),
tgtnn AS (SELECT tgt, sum(icos) AS tsum, count(*) AS tcnt
          FROM r WHERE rt <= {knn} GROUP BY 1),
scored AS (SELECT r.src, r.tgt, r.tgt_lang, r.icos,
                  2 * r.icos * s.scnt * t.tcnt AS mnum,
                  s.ssum * t.tcnt + t.tsum * s.scnt AS mden
           FROM r JOIN srcnn s ON s.src = r.src AND s.tgt_lang = r.tgt_lang
                  JOIN tgtnn t ON t.tgt = r.tgt
           WHERE s.ssum * t.tcnt + t.tsum * s.scnt > 0),
best AS (SELECT *,
           row_number() OVER (PARTITION BY src, tgt_lang
                              ORDER BY mnum::DOUBLE / mden::DOUBLE DESC, tgt) AS fwd,
           row_number() OVER (PARTITION BY tgt
                              ORDER BY mnum::DOUBLE / mden::DOUBLE DESC, src) AS rev
         FROM scored)
SELECT src, tgt, tgt_lang, icos,
       mnum::DOUBLE / mden::DOUBLE AS margin,
       (100 * mnum >= {margin_pct} * mden)::BIGINT AS kept,
       (rev = 1)::BIGINT AS mutual
FROM best WHERE fwd = 1
ORDER BY src, tgt_lang
"""
