"""Corpus-curation operators round 3: semantic dedup over embeddings,
training-sequence packing, and the keep/drop rule bundle.

These extend the LLM-pipeline suite (dedup.py / textstats.py /
simsearch.py) with the three remaining steps a pretraining data
pipeline runs between "scored" and "training batches":

* :func:`semdedup` — SemDeDup (Abbas et al., 2023): cluster the
  embedding space coarsely, then inside each cluster drop every vector
  that is cosine-similar to a lower-id keeper. Pairwise keep-first
  (drop b when some a<b in the same cell has cos≥t) rather than the
  paper's sequential scan — deterministic, SQL-expressible, and at
  scale the intra-cell self-join is bounded by the cell size (n/K per
  cell; for mega-cells compose with the banded LSH from simsearch.py
  inside the cell).
* :func:`sequence_packing` — Megatron-style greedy chop: stream each
  (source, hash-bucket) partition in doc_id order and cut it into
  fixed ``ctx_len``-token bins; a doc's bin and intra-bin offset are
  pure prefix-sum arithmetic (one window). Bucketing bounds every
  window partition so a mega-source never serializes into one task —
  same salting discipline as the politeness gate.
* :func:`quality_filter_verdicts` — the Gopher/RedPajama-shaped rule
  bundle over the quality heuristics already in textstats.py, emitting
  keep + machine-readable reasons so downstream mixture sampling can
  re-weight instead of hard-dropping.

Every operator has a DuckDB oracle twin (md5int parity hashing where
hashing is needed; fixed-point integer dots for the cluster
assignment, as in simsearch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import MD5INT_SQL, TOKENS_SQL, md5int, tokens
from ..sources.tables import load
from .simsearch import (
    DOT_SCALE,
    ICOS_SCALE,
    N_CELLS,
    cell_assign_udf,
    literal_cell_scores,
    pivot_centroids,
)
from .textstats import STOPWORDS

SEM_THRESHOLD = 0.45


def semdedup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = SEM_THRESHOLD,
    n_cells: int | str = N_CELLS,
    centroids: list[tuple[int, list[float]]] | None = None,
    quantizer: str = "matmul",
) -> DataFrame:
    """(vec_id, cell, is_kept): coarse-cluster every embedding to its
    nearest pivot centroid (deterministic integer dots — same quantizer
    as ann_ivf_topk), then within each cell drop vectors cosine-similar
    (floor(cos·1e4) >= threshold·1e4, on the exact int64 fixed-point
    grid) to any lower-id vector of that cell.

    Plan: row-local cell assignment (no shuffle — an Arrow-batched
    int64-matmul Pandas UDF carrying the centroid matrix in its
    closure; ``quantizer="literal"`` selects the F.lit expression twin,
    bit-identical, for parity tests), ONE intra-cell self-join on the
    id-ordered pair predicate, distinct drop set, left-anti flag join.
    The pair join carries only (cell, vec_id, embedding); at 10^10
    vectors the table is stored partitioned by cell so the self-join is
    partition-local.

    Cell-count scaling: SemDeDup needs k ∝ √N (Abbas et al. 2023) so
    the expected intra-cell pair count N²/k grows as N^1.5, not N².
    ``n_cells="sqrt"`` sets k = max(16, ⌈√N⌉) from the corpus count;
    the registered oracle query keeps the fixed default so the DuckDB
    twin (literal {n_cells}) stays reproducible."""
    emb = load(spark, "embeddings", sf_dir)
    if n_cells == "sqrt":
        import math

        n_cells = max(16, math.isqrt(emb.count() - 1) + 1)
    cents = centroids if centroids is not None else pivot_centroids(emb, n_cells)

    if quantizer == "matmul":
        cell_col = cell_assign_udf(cents, 1)(F.col("embedding")).getItem(0)
    else:
        scores = literal_cell_scores(cents)
        cell_col = -F.array_max(scores(F.col("embedding"))).getField("nc")
    assigned = emb.select("vec_id", "embedding", cell_col.alias("cell"))
    # pair cosine on the INTEGER grid (bitext_mining discipline): exact
    # int64 fixed-point dot + norms on the floor(v*1e6) grid, then
    # icos = floor(idot / sqrt(na) / sqrt(nb) * 1e4) — each step an
    # IEEE-exact op on int64-derived doubles in the same order as the
    # oracle, so the drop verdict is engine-exact (no data-dependent
    # float boundary; round-4 verdict "What's wrong" #3). Norm
    # quantized array AND norm precomputed per VECTOR (one transform +
    # one fold each), never per pair — the pair stage then runs ONE
    # int64 zip_with multiply-sum per candidate (re-flooring inside the
    # pair loop measured 2× the whole query's cost at sf0.1)
    qarr = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * DOT_SCALE).cast("long"),
    )
    inorm = F.aggregate(
        F.col("qemb"), F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    sides = (
        assigned.withColumn("qemb", qarr)
        .withColumn("inorm", inorm)
        # sqrt hoisted per VECTOR as well — the same IEEE sqrt value the
        # oracle computes per pair, so icos stays bit-identical while
        # the pair loop does one zip_with sum + two divs + one floor
        .withColumn("snorm", F.sqrt(F.col("inorm").cast("double")))
    )
    a = sides.select(
        F.col("cell"),
        F.col("vec_id").alias("a"),
        F.col("qemb").alias("qa"),
        F.col("inorm").alias("na"),
        F.col("snorm").alias("sna"),
    )
    b = sides.select(
        F.col("cell"),
        F.col("vec_id").alias("b"),
        F.col("qemb").alias("qb"),
        F.col("inorm").alias("nb"),
        F.col("snorm").alias("snb"),
    )
    icos_t = int(round(threshold * ICOS_SCALE))
    idot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    icos = F.floor(
        idot.cast("double")
        / F.col("sna")
        / F.col("snb")
        * F.lit(float(ICOS_SCALE))
    ).cast("long")
    drops = (
        a.join(b, "cell")
        .filter(F.col("a") < F.col("b"))
        # zero-norm embeddings have no cosine — never drop by/with them
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .withColumn("icos", icos)
        .filter(F.col("icos") >= icos_t)
        .select("b")
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return (
        assigned.join(drops, assigned.vec_id == F.col("b"), "left")
        .select(
            "vec_id",
            "cell",
            F.col("__dropped").isNull().alias("is_kept"),
        )
        .orderBy("vec_id")
    )


def semdedup_sql(
    threshold: float = SEM_THRESHOLD, n_cells: int = N_CELLS
) -> str:
    return f"""
WITH cents AS (
  SELECT vec_id AS ccid, embedding AS cvec FROM embeddings
  WHERE vec_id < {n_cells}
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
assigned AS (
  SELECT c.vec_id, c.cell, e.embedding
  FROM cells c JOIN embeddings e USING (vec_id)
),
pex AS (
  -- pair cosine on the integer grid (bitext_mining discipline): exact
  -- int64 dot + norms on the floor(v*1e6) grid, then
  -- floor(idot / sqrt(na) / sqrt(nb) * 1e4) — same IEEE op order as
  -- the Spark side, so the drop verdict is engine-exact
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         floor(unnest(embedding)::DOUBLE * {DOT_SCALE})::BIGINT AS q
  FROM embeddings
),
pnorms AS (SELECT vec_id, sum(q * q) AS inorm FROM pex GROUP BY 1),
cpairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM assigned x JOIN assigned y
    ON x.cell = y.cell AND x.vec_id < y.vec_id
),
pdots AS (
  SELECT c.a, c.b, sum(pa.q * pb.q) AS idot
  FROM cpairs c JOIN pex pa ON pa.vec_id = c.a
                JOIN pex pb ON pb.vec_id = c.b AND pa.d = pb.d
  GROUP BY 1, 2
),
drops AS (
  SELECT DISTINCT d.b
  FROM pdots d JOIN pnorms na ON na.vec_id = d.a
               JOIN pnorms nb ON nb.vec_id = d.b
  WHERE na.inorm > 0 AND nb.inorm > 0
    AND floor(d.idot::DOUBLE / sqrt(na.inorm::DOUBLE)
              / sqrt(nb.inorm::DOUBLE) * {ICOS_SCALE})::BIGINT
        >= {int(round(threshold * ICOS_SCALE))}
)
SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
       (d.b IS NULL) AS is_kept
FROM assigned a LEFT JOIN drops d ON a.vec_id = d.b
ORDER BY a.vec_id
"""


PACK_CTX = 512
PACK_BUCKETS = 8


def sequence_packing(
    spark: SparkSession,
    sf_dir: str,
    ctx_len: int = PACK_CTX,
    buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Greedy-chop sequence packing: concatenate each (source, bucket)
    stream in doc_id order and cut every ``ctx_len`` tokens; each doc
    reports its bin and intra-bin token offset (docs may straddle bins —
    the boundary-bleed packing used for pretraining batches).

    bin/offset are prefix sums over ONE window; ``buckets``
    (md5int-salted) bounds the window partition size so a source owning
    most of the corpus still packs in parallel — per-bucket streams are
    independent training shards."""
    docs = load(spark, "documents", sf_dir)
    n_tok = F.size(tokens(F.col("text")))
    bucket = F.pmod(
        md5int(F.concat(F.lit("pk:"), F.col("doc_id").cast("string"))),
        F.lit(buckets),
    ).cast("int")
    base = docs.select(
        "source", "doc_id", bucket.alias("bucket"), n_tok.alias("n_tok")
    )
    w = (
        Window.partitionBy("source", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    return (
        base.withColumn("bin", F.floor(cum_before / ctx_len).cast("int"))
        .withColumn("bin_offset", F.pmod(cum_before, F.lit(ctx_len)).cast("int"))
        .orderBy("doc_id")
    )


def sequence_packing_sql(
    ctx_len: int = PACK_CTX, buckets: int = PACK_BUCKETS
) -> str:
    tok = TOKENS_SQL.format(c="text")
    h = MD5INT_SQL.format(c="('pk:' || CAST(doc_id AS VARCHAR))")
    return f"""
WITH base AS (
  SELECT source, doc_id,
         CAST({h} % {buckets} AS INT) AS bucket,
         len({tok}) AS n_tok
  FROM documents
),
packed AS (
  SELECT source, doc_id, bucket, n_tok,
         coalesce(sum(n_tok) OVER (PARTITION BY source, bucket
                                   ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS cum_before
  FROM base
)
SELECT source, doc_id, bucket, CAST(n_tok AS INT) AS n_tok,
       CAST(cum_before // {ctx_len} AS INT) AS bin,
       CAST(cum_before % {ctx_len} AS INT) AS bin_offset
FROM packed ORDER BY doc_id
"""


def quality_filter_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop verdict per doc with machine-readable reasons, built
    from the same row-local heuristics quality_scores computes (Gopher
    rules §A1.1 shape): token count bounds, mean word length band,
    punctuation density, stopword presence. All codegen exprs, no
    shuffle (final orderBy is presentation only)."""
    docs = load(spark, "documents", sf_dir)
    tok = tokens(F.col("text"))
    n_tok = F.size(tok)
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), r"[^\w\s]", ""))
    en_hits = F.size(F.filter(tok, lambda t: t.isin(*STOPWORDS["en"])))
    mean_wl = F.aggregate(
        tok, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tok, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    rules = [
        ("too_short", n_tok < 30),
        ("too_long", n_tok > 100_000),
        ("word_len_out_of_band", (mean_wl < 3) | (mean_wl > 10)),
        ("high_punctuation", punct_ratio > 0.1),
        ("no_stopwords", en_hits == 0),
    ]
    reasons = F.filter(
        F.array(
            *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in rules]
        ),
        lambda x: x.isNotNull(),
    )
    return docs.select(
        "doc_id",
        reasons.alias("reasons"),
        (F.size(reasons) == 0).alias("keep"),
    ).orderBy("doc_id")


def quality_filter_verdicts_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    lst = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH m AS (
  SELECT doc_id,
         len({tok}) AS n_tok,
         list_sum(list_transform({tok}, t -> length(t))) * 1.0 /
           greatest(len({tok}), 1) AS mean_wl,
         (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
           * 1.0 / greatest(length(text), 1) AS punct_ratio,
         len(list_filter({tok}, t -> t IN ({lst}))) AS en_hits
  FROM documents
),
v AS (
  SELECT doc_id,
         list_filter([
           CASE WHEN n_tok < 30 THEN 'too_short' END,
           CASE WHEN n_tok > 100000 THEN 'too_long' END,
           CASE WHEN mean_wl < 3 OR mean_wl > 10 THEN 'word_len_out_of_band' END,
           CASE WHEN punct_ratio > 0.1 THEN 'high_punctuation' END,
           CASE WHEN en_hits = 0 THEN 'no_stopwords' END
         ], x -> x IS NOT NULL) AS reasons
  FROM m
)
SELECT doc_id, reasons, (len(reasons) = 0) AS keep
FROM v ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# leakage-safe train/validation split
# ---------------------------------------------------------------------------

VAL_PCT = 10  # percent of CLUSTERS (not docs) held out


def leakage_safe_split(
    spark: SparkSession,
    sf_dir: str,
    val_pct: int = VAL_PCT,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Train/validation assignment that cannot leak near-duplicates
    across the split: the unit of assignment is the NEAR-DUP CLUSTER
    (transitive closure of the n-gram-Jaccard pairs — dedup_clusters),
    not the document. Splitting docs independently lets a held-out doc
    have a 0.9-Jaccard twin in train — the contamination Lee et al.
    2022 measure benchmarks inflating on; hashing the cluster id means
    twins travel together by construction.

    Plan shape: the cluster resolution is dedup_clusters' bounded
    label-propagation; the split itself is one left join (docs in no
    pair are their own singleton cluster) and a row-local hash-mod —
    deterministic, so re-runs and engines agree on every assignment."""
    from .graph import dedup_clusters

    docs = load(spark, "documents", sf_dir).select("doc_id")
    if clusters is None:
        clusters = dedup_clusters(spark, sf_dir)
    cl = clusters.select("doc_id", "cluster_id")
    assigned = docs.join(cl, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster"),
    )
    bucket = md5int(
        F.concat(F.lit("split:"), F.col("cluster").cast("string"))
    ) % 100
    return (
        assigned.select(
            "doc_id",
            "cluster",
            F.when(bucket < val_pct, F.lit("val"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
        .orderBy("doc_id")
    )


def leakage_safe_split_sql(val_pct: int = VAL_PCT) -> str:
    from .graph import dedup_clusters_sql

    base = dedup_clusters_sql().strip()
    inner = base[base.index("WITH") + 4 : base.rindex("SELECT node")].strip()
    prev = base[base.rindex("FROM l") : base.rindex("ORDER BY")].split()[1]
    h = MD5INT_SQL.format(c="('split:' || cluster)")
    return f"""
WITH {inner},
cl AS (SELECT node AS doc_id, label AS cluster_id FROM {prev}),
assigned AS (
  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster
  FROM documents d LEFT JOIN cl USING (doc_id)
)
SELECT doc_id, cluster,
       CASE WHEN {h} % 100 < {val_pct} THEN 'val' ELSE 'train' END AS split
FROM assigned
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# end-to-end curation funnel
# ---------------------------------------------------------------------------


def _strip_order_by(sql: str) -> str:
    """Drop a query's trailing presentation ORDER BY so it can nest as
    a subquery stage."""
    s = sql.strip()
    cut = s.rfind("ORDER BY")
    return s[:cut] if cut > 0 else s


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel a data lead actually reviews before a training run:
    how many documents (and training tokens) survive each curation
    stage, end to end —

      total → quality keep (Gopher gates) → canonical copy per
      near-dup cluster (keep-best) → not in the LM tail bucket →
      landed in the train split (cluster-hashed holdout)

    One row of exact integers, composed from the SAME registered
    operators a user would chain (each stage is a doc_id left join +
    filter on top of the previous — no re-implementation), so the
    funnel's numbers are consistent with every per-stage query by
    construction. Stage order mirrors practice: dedup before LM
    bucketing (tail scoring on deduped text), split last."""
    from .corpus_stats import dedup_keep_best
    from .graph import dedup_clusters
    from .textstats import lm_perplexity_buckets

    docs = load(spark, "documents", sf_dir).select("doc_id")
    q = quality_filter_verdicts(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("q_keep")
    )
    # the near-dup closure (the funnel's heaviest stage — a banded
    # pair join + label propagation) is resolved ONCE; its label-prop
    # output is already eagerly checkpointed, so both consumers reuse
    # the same materialized RDD instead of recomputing the closure
    clusters = dedup_clusters(spark, sf_dir)
    kb = dedup_keep_best(spark, sf_dir, clusters=clusters).select(
        "doc_id", F.col("keep").alias("kb_keep")
    )
    lm = lm_perplexity_buckets(spark, sf_dir).select("doc_id", "bucket", "n_tok")
    sp = leakage_safe_split(spark, sf_dir, clusters=clusters).select(
        "doc_id", "split"
    )

    staged = (
        docs.join(q, "doc_id", "left")
        .join(kb, "doc_id", "left")
        .join(lm, "doc_id", "left")
        .join(sp, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.col("q_keep").alias("s1"),
            # docs in no near-dup cluster are implicitly canonical
            (F.col("q_keep") & F.coalesce("kb_keep", F.lit(True))).alias("s2"),
            (
                F.col("q_keep")
                & F.coalesce("kb_keep", F.lit(True))
                & (F.coalesce("bucket", F.lit("")) != F.lit("tail"))
            ).alias("s3"),
            (
                F.col("q_keep")
                & F.coalesce("kb_keep", F.lit(True))
                & (F.coalesce("bucket", F.lit("")) != F.lit("tail"))
                & (F.col("split") == "train")
            ).alias("s4"),
        )
    )
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("long")
    return staged.agg(
        F.count(F.lit(1)).alias("n_total"),
        cnt("s1").alias("n_quality"),
        cnt("s2").alias("n_canonical"),
        cnt("s3").alias("n_not_tail"),
        cnt("s4").alias("n_train"),
        F.sum(F.when(F.col("s4"), F.col("n_tok")).otherwise(0))
        .cast("long")
        .alias("train_tokens"),
    )


def curation_funnel_sql() -> str:
    from .corpus_stats import dedup_keep_best_sql
    from .textstats import lm_perplexity_buckets_sql

    q = _strip_order_by(quality_filter_verdicts_sql())
    kb = _strip_order_by(dedup_keep_best_sql())
    lm = _strip_order_by(lm_perplexity_buckets_sql())
    sp = _strip_order_by(leakage_safe_split_sql())
    return f"""
WITH staged AS (
  SELECT d.doc_id, lm.n_tok,
         q.keep AS s1,
         (q.keep AND coalesce(kb.keep, TRUE)) AS s2,
         (q.keep AND coalesce(kb.keep, TRUE)
          AND coalesce(lm.bucket, '') <> 'tail') AS s3,
         (q.keep AND coalesce(kb.keep, TRUE)
          AND coalesce(lm.bucket, '') <> 'tail'
          AND sp.split = 'train') AS s4
  FROM documents d
  LEFT JOIN ({q}) q ON d.doc_id = q.doc_id
  LEFT JOIN ({kb}) kb ON d.doc_id = kb.doc_id
  LEFT JOIN ({lm}) lm ON d.doc_id = lm.doc_id
  LEFT JOIN ({sp}) sp ON d.doc_id = sp.doc_id
)
SELECT count(*) AS n_total,
       sum(CASE WHEN s1 THEN 1 ELSE 0 END)::BIGINT AS n_quality,
       sum(CASE WHEN s2 THEN 1 ELSE 0 END)::BIGINT AS n_canonical,
       sum(CASE WHEN s3 THEN 1 ELSE 0 END)::BIGINT AS n_not_tail,
       sum(CASE WHEN s4 THEN 1 ELSE 0 END)::BIGINT AS n_train,
       sum(CASE WHEN s4 THEN n_tok ELSE 0 END)::BIGINT AS train_tokens
FROM staged
"""


# ---------------------------------------------------------------------------
# contrastive triplet mining for embedding-model training data
# ---------------------------------------------------------------------------

TRI_NEG_SALT = "trineg|"
TRI_NEG_PROBES = 3  # only 2 ids (anchor/positive) can ever be excluded


def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, negative) triplet mining — the training-data
    step of a contrastive embedding-model pipeline (E5-style weakly
    supervised pairs, Wang et al. 2022; SimCSE-style random negatives):
    positives are the corpus's verified near-dup pairs, negatives are
    deterministic pseudo-random draws from the rest of the corpus.

    Composition + plan shape:

    * positives REUSE :func:`~.dedup.dedup_minhash_lsh` (the registered
      operator — banded LSH candidate join + exact-Jaccard verify), so
      triplets are consistent with the dedup family by construction;
      the band equi-join stays the only corpus-scale shuffle;
    * negatives: rank the corpus once with ordering.ordered_seq_counted
      (range-shuffle two-phase rank — NO single-partition window; the
      corpus row count falls out for free), then per pair probe ranks
      (md5int(salt‖a‖b) + k) % N for k < TRI_NEG_PROBES and keep the
      first probe that is neither the anchor nor the positive — one
      3-way explode, one equi-join on rank, one min_by(k) aggregate.
      Probing by RANK (not by raw id) keeps the draw correct when
      doc_ids are sparse; with only two excludable ids, 3 probes always
      yield a negative. A "hard negative" upgrade mines same-LSH-band
      non-verified candidates instead of uniform draws — same joins,
      different candidate source.
    """
    from .dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir)  # (a, b, jaccard), a < b
    return _uniform_triplets(spark, sf_dir, pairs).orderBy("anchor", "positive")


def contrastive_triplets_sql() -> str:
    from .dedup import dedup_minhash_lsh_sql

    pairs = _strip_order_by(dedup_minhash_lsh_sql())
    h = MD5INT_SQL.format(c="'" + TRI_NEG_SALT + "' || a::VARCHAR || '|' || b::VARCHAR")
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT * FROM ({pairs})
),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS r
  FROM documents),
n AS (SELECT count(*) AS nn FROM documents),
probes AS (
  SELECT p.a, p.b, p.jaccard, k.k, rk.doc_id AS cand
  FROM pairs p
  JOIN (SELECT unnest(range(0, {TRI_NEG_PROBES})) AS k) k ON true
  JOIN n ON true
  JOIN ranked rk ON rk.r = (({h}) + k.k) % n.nn
  WHERE rk.doc_id <> p.a AND rk.doc_id <> p.b)
SELECT a AS anchor, b AS positive,
       min_by(cand, k) AS negative, max(jaccard) AS jaccard
FROM probes GROUP BY a, b
ORDER BY anchor, positive
"""


TRI_POS_T = 0.5  # dedup_minhash_lsh's default verify threshold
TRI_HARD_SALT = "trihard|"


def contrastive_triplets_hard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hard-negative triplet mining — the upgrade the uniform-draw
    docstring names, built: a hard negative is a document that LOOKS
    like the anchor (band-collided in the same LSH index) but verified
    below the near-dup threshold — lexically close non-duplicates, the
    negatives that actually move a contrastive loss (cf. the hard-
    negative mining in E5 / DPR training pipelines).

    One extra pass over the SAME index: run the minhash verify at
    threshold 0 (identical plan — the banded join already produced
    every candidate; the threshold is a post-verify filter), split
    pairs into positives (jaccard ≥ TRI_POS_T) and hard candidates
    (below), then per anchor keep the salted-md5-smallest hard
    candidate via a bounded per-anchor window (candidates per anchor ≤
    band collisions, corpus-scale bounded by the same df-cap arguments
    as the dedup family). Anchors with no hard candidate fall back to
    the uniform rank-probe draw, labeled ``neg_kind = 'random'`` so a
    training run can weight the two pools differently.

    A hard candidate can never equal the triplet's positive (the same
    unordered pair cannot verify both ≥ and < the threshold)."""
    from .dedup import dedup_minhash_lsh

    allc = dedup_minhash_lsh(spark, sf_dir, threshold=0.0).localCheckpoint(
        eager=True
    )
    pos = allc.filter(F.col("jaccard") >= TRI_POS_T)
    hard = allc.filter(F.col("jaccard") < TRI_POS_T)
    cands = hard.select(
        F.col("a").alias("anchor"), F.col("b").alias("cand")
    ).unionByName(
        hard.select(F.col("b").alias("anchor"), F.col("a").alias("cand"))
    )
    hh = md5int(
        F.concat(
            F.lit(TRI_HARD_SALT),
            F.col("anchor").cast("string"),
            F.lit("|"),
            F.col("cand").cast("string"),
        )
    )
    w = Window.partitionBy("anchor").orderBy("hh", "cand")
    pick = (
        cands.withColumn("hh", hh)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("anchor", F.col("cand").alias("hard_neg"))
    )
    base = _uniform_triplets(spark, sf_dir, pos)
    return (
        base.join(pick, "anchor", "left")
        .select(
            "anchor",
            "positive",
            F.coalesce("hard_neg", "negative").alias("negative"),
            F.when(F.col("hard_neg").isNotNull(), F.lit("hard"))
            .otherwise(F.lit("random"))
            .alias("neg_kind"),
            "jaccard",
        )
        .orderBy("anchor", "positive")
    )


def _uniform_triplets(
    spark: SparkSession, sf_dir: str, pairs: DataFrame
) -> DataFrame:
    """The uniform rank-probe negative draw over a given positive-pair
    frame — shared by :func:`contrastive_triplets` (its whole negative
    stage) and :func:`contrastive_triplets_hard` (the fallback pool)."""
    from .ordering import ordered_seq_counted

    docs = load(spark, "documents", sf_dir).select("doc_id")
    ranked, n = ordered_seq_counted(docs, ["doc_id"], seq_col="r")
    h = md5int(
        F.concat(
            F.lit(TRI_NEG_SALT),
            F.col("a").cast("string"),
            F.lit("|"),
            F.col("b").cast("string"),
        )
    )
    probes = (
        pairs.withColumn("h", h)
        .withColumn(
            "k", F.explode(F.array(*[F.lit(i) for i in range(TRI_NEG_PROBES)]))
        )
        .withColumn("r", (F.col("h") + F.col("k")) % F.lit(n))
        .join(ranked.select("r", F.col("doc_id").alias("cand")), "r")
        .filter((F.col("cand") != F.col("a")) & (F.col("cand") != F.col("b")))
    )
    return (
        probes.groupBy("a", "b")
        .agg(
            F.max("jaccard").alias("jaccard"),
            F.min_by("cand", "k").alias("negative"),
        )
        .select(
            F.col("a").alias("anchor"),
            F.col("b").alias("positive"),
            "negative",
            "jaccard",
        )
    )


def contrastive_triplets_hard_sql() -> str:
    from .dedup import dedup_minhash_lsh_sql

    allc = _strip_order_by(dedup_minhash_lsh_sql(0.0))
    hh = MD5INT_SQL.format(
        c="'" + TRI_HARD_SALT + "' || anchor::VARCHAR || '|' || cand::VARCHAR"
    )
    hu = MD5INT_SQL.format(c="'" + TRI_NEG_SALT + "' || a::VARCHAR || '|' || b::VARCHAR")
    return f"""
WITH allc AS MATERIALIZED (
  SELECT * FROM ({allc})
),
pos AS (SELECT * FROM allc WHERE jaccard >= {TRI_POS_T}),
hard AS (SELECT * FROM allc WHERE jaccard < {TRI_POS_T}),
cands AS (
  SELECT a AS anchor, b AS cand FROM hard
  UNION ALL
  SELECT b AS anchor, a AS cand FROM hard),
pick AS (
  SELECT anchor, cand AS hard_neg FROM (
    SELECT anchor, cand,
           row_number() OVER (PARTITION BY anchor ORDER BY {hh}, cand) AS rn
    FROM cands) WHERE rn = 1),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS r
  FROM documents),
n AS (SELECT count(*) AS nn FROM documents),
probes AS (
  SELECT p.a, p.b, p.jaccard, k.k, rk.doc_id AS cand
  FROM pos p
  JOIN (SELECT unnest(range(0, {TRI_NEG_PROBES})) AS k) k ON true
  JOIN n ON true
  JOIN ranked rk ON rk.r = (({hu}) + k.k) % n.nn
  WHERE rk.doc_id <> p.a AND rk.doc_id <> p.b),
base AS (
  SELECT a AS anchor, b AS positive,
         min_by(cand, k) AS negative, max(jaccard) AS jaccard
  FROM probes GROUP BY a, b)
SELECT b.anchor, b.positive,
       coalesce(p.hard_neg, b.negative) AS negative,
       CASE WHEN p.hard_neg IS NULL THEN 'random' ELSE 'hard' END AS neg_kind,
       b.jaccard
FROM base b LEFT JOIN pick p USING (anchor)
ORDER BY anchor, positive
"""


# ---------------------------------------------------------------------------
# Centroid outliers — embedding-space quality audit
# ---------------------------------------------------------------------------

CENT_SCALE = 10_000   # embedding value -> int grid: q = floor(v * 1e4)
CENT_ICOS = 10_000    # cosine -> int grid (simsearch.ICOS_SCALE convention)
OUT_K = 5             # per-label outlier count to flag


def centroid_outliers(
    spark: SparkSession, sf_dir: str, out_k: int = OUT_K
) -> DataFrame:
    """(vec_id, label, icos, out_rnk, is_outlier): cosine of every
    embedding to its own label's centroid, flagging the ``out_k`` least
    central vectors per label. The standard embedding-space data-quality
    audit (mislabeled / off-topic / garbage docs sit far from their
    cluster centroid — cf. the centroid-distance filters in SemDeDup
    §4 and CLIP-score-style curation): run it per topic / per source /
    per language bucket and route the tail to review or drop.

    Scale shape — NO pairwise stage at all (the audit is linear where
    semdedup is quadratic-within-cell): one posexplode of the embedding
    column, ONE map-side-combined (label, dim) sum — the centroid —
    whose output is |labels|·dim rows (broadcast back), then one
    (vec_id) re-agg computing the dot and the vector norm in the same
    pass. The only corpus-scale exchanges are the two aggs; the
    per-label bottom-k window partitions by label (for mega-labels swap
    in the two-phase salted rank the vocab_coverage op uses).

    Determinism: all sums are exact int64 on the floor(v·1e4) grid;
    the centroid is count-normalized IN INTEGER (cd = (Σq·1e4) div n)
    so per-dim magnitude is bounded by the grid — independent of label
    size — and the final cosine is the floor-to-1e4 of int64-derived
    doubles (identical op order cross-engine: div, div, mul, floor)."""
    emb = load(spark, "embeddings", sf_dir)
    q = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("d", "v"),
    ).select(
        "vec_id",
        "label",
        "d",
        F.floor(F.col("v").cast("double") * CENT_SCALE)
        .cast("long")
        .alias("q"),
    )
    cents = (
        q.groupBy("label", "d")
        .agg(F.sum("q").alias("sq"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "d",
            F.expr(f"(sq * {CENT_SCALE}) div n").alias("cd"),
        )
    ).localCheckpoint(eager=True)  # |labels|·dim rows — feeds 2 consumers
    cnorm = cents.groupBy("label").agg(
        F.sum(F.col("cd") * F.col("cd")).alias("nc")
    )
    scored = (
        q.join(F.broadcast(cents), ["label", "d"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("q") * F.col("cd")).alias("idot"),
            F.sum(F.col("q") * F.col("q")).alias("nx"),
        )
        .join(F.broadcast(cnorm), "label")
        .select(
            "vec_id",
            "label",
            F.floor(
                F.col("idot").cast("double")
                / F.sqrt(F.col("nx").cast("double"))
                / F.sqrt(F.col("nc").cast("double"))
                * F.lit(float(CENT_ICOS))
            )
            .cast("long")
            .alias("icos"),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.asc("icos"), F.asc("vec_id")
    )
    return (
        scored.withColumn("out_rnk", F.row_number().over(w))
        .select(
            "vec_id",
            "label",
            "icos",
            "out_rnk",
            (F.col("out_rnk") <= out_k).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


def centroid_outliers_sql(out_k: int = OUT_K) -> str:
    s = CENT_SCALE
    return f"""
WITH q AS (
  SELECT vec_id, label, d, floor(v::DOUBLE * {s})::BIGINT AS q
  FROM (SELECT vec_id, label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings)
),
cents AS (
  SELECT label, d, (sum(q) * {s}) // count(*) AS cd
  FROM q GROUP BY label, d
),
cnorm AS (SELECT label, sum(cd * cd) AS nc FROM cents GROUP BY label),
scored AS (
  SELECT q.vec_id, q.label,
         floor(sum(q.q * c.cd)::DOUBLE
               / sqrt(sum(q.q * q.q)::DOUBLE)
               / sqrt(any_value(n.nc)::DOUBLE) * {float(CENT_ICOS)})::BIGINT AS icos
  FROM q JOIN cents c ON q.label = c.label AND q.d = c.d
         JOIN cnorm n ON q.label = n.label
  GROUP BY q.vec_id, q.label
)
SELECT vec_id, label, icos,
       row_number() OVER (PARTITION BY label
                          ORDER BY icos ASC, vec_id ASC) AS out_rnk,
       row_number() OVER (PARTITION BY label
                          ORDER BY icos ASC, vec_id ASC) <= {out_k}
         AS is_outlier
FROM scored ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# filter agreement — per-source Cohen's kappa between quality filters
# ---------------------------------------------------------------------------

KAPPA_SCALE = 1_000_000


def filter_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Cohen's kappa (Cohen 1960) between the two
    independent quality filters this pipeline runs: the rule-based
    Gopher-shaped verdict (quality_filter_verdicts `keep`) and the
    CCNet-style LM-perplexity filter (lm_perplexity_buckets, keep ⇔
    bucket ≠ 'tail'). Raw agreement is inflated by class imbalance —
    two filters that each keep ~80% agree ~68% of the time by chance
    alone — and kappa subtracts exactly that chance floor PER SOURCE,
    so the readout names the hosts where heuristic and LM quality
    disagree (the docs one filter would ship and the other would burn
    — the first place a curation owner looks before picking which
    filter gates a training run).

    kappa = (po − pe)/(1 − pe) stated entirely in integers:
    kappa·10^6 = sign(num)·(|num|·10^6 div den) with
    num = (n11+n00)·n − k1·p1 − k0·p0, den = n² − k1·p1 − k0·p0
    (k/p = per-filter keep/drop marginals). The sign·abs-div idiom
    keeps Spark `div` ≡ DuckDB `//` on the sources whose kappa is
    NEGATIVE (worse than chance — they exist on shipped data and the
    tests pin one). Degenerate sources (pe = 1) emit NULL, not a fake
    0. Zero-token docs (NULL bucket) are excluded by both engines.

    Plan shape: both member queries composed as-is (search_serve
    pattern); one doc_id equi-join, ONE map-side confusion agg keyed
    by source, kappa row-local on the 20-row aggregate. int64
    headroom: num·10^6 ≤ n²·10^6 — exact to ~3M docs per source;
    beyond that, audit on a per-source hash sample (same plan)."""
    from .textstats import lm_perplexity_buckets

    docs = load(spark, "documents", sf_dir).select("doc_id", "source")
    a = quality_filter_verdicts(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("long").alias("ka")
    )
    b = (
        lm_perplexity_buckets(spark, sf_dir)
        .filter(F.col("bucket").isNotNull())
        .select("doc_id", (F.col("bucket") != "tail").cast("long").alias("kb"))
    )
    j = docs.join(a, "doc_id").join(b, "doc_id")
    g = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ka") * F.col("kb")).alias("n11"),
        F.sum(F.col("ka") * (1 - F.col("kb"))).alias("n10"),
        F.sum((1 - F.col("ka")) * F.col("kb")).alias("n01"),
        F.sum((1 - F.col("ka")) * (1 - F.col("kb"))).alias("n00"),
    )
    num = (
        (F.col("n11") + F.col("n00")) * F.col("n")
        - (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        - (F.col("n00") + F.col("n01")) * (F.col("n00") + F.col("n10"))
    )
    den = (
        F.col("n") * F.col("n")
        - (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        - (F.col("n00") + F.col("n01")) * (F.col("n00") + F.col("n10"))
    )
    return (
        g.withColumn("__num", num)
        .withColumn("__den", den)
        .withColumn(
            "kappa_ppm",
            F.when(F.col("__den") == 0, F.lit(None).cast("long")).otherwise(
                (
                    F.signum("__num").cast("long")
                    * F.expr(f"abs(__num * {KAPPA_SCALE}) div __den")
                ).cast("long")
            ),
        )
        .select("source", "n", "n11", "n10", "n01", "n00", "kappa_ppm")
        .orderBy("source")
    )


def filter_agreement_sql() -> str:
    from .textstats import lm_perplexity_buckets_sql

    return f"""
WITH a AS MATERIALIZED (
  SELECT doc_id, keep::BIGINT AS ka FROM ({quality_filter_verdicts_sql()})),
b AS MATERIALIZED (
  SELECT doc_id, (bucket <> 'tail')::BIGINT AS kb
  FROM ({lm_perplexity_buckets_sql()}) WHERE bucket IS NOT NULL),
j AS (
  SELECT d.source, a.ka, b.kb
  FROM documents d JOIN a USING (doc_id) JOIN b USING (doc_id)),
g AS (
  SELECT source, count(*) AS n,
         sum(ka * kb)::BIGINT AS n11,
         sum(ka * (1 - kb))::BIGINT AS n10,
         sum((1 - ka) * kb)::BIGINT AS n01,
         sum((1 - ka) * (1 - kb))::BIGINT AS n00
  FROM j GROUP BY source),
k AS (
  SELECT *,
         (n11 + n00) * n - (n11 + n10) * (n11 + n01)
           - (n00 + n01) * (n00 + n10) AS num,
         n * n - (n11 + n10) * (n11 + n01)
           - (n00 + n01) * (n00 + n10) AS den
  FROM g)
SELECT source, n, n11, n10, n01, n00,
       CASE WHEN den = 0 THEN NULL
            ELSE ((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                 * (abs(num * {KAPPA_SCALE}) // den))::BIGINT END AS kappa_ppm
FROM k ORDER BY source
"""
