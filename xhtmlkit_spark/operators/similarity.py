"""Similarity search over embedding columns (array<float>).

Two paths, both JVM-side (zip_with/aggregate — no Python UDFs):

* brute-force cosine top-k — exact baseline; the query set is tiny and
  broadcast, so cost is O(|corpus| × |queries|), one scan, no shuffle
  beyond the final per-query top-k (TakeOrdered).
* LSH-bucketed ANN — random-hyperplane signatures (deterministic
  md5-derived ±1 planes, so the DuckDB oracle reproduces them bit-for-
  bit); candidates meet only inside a bucket, the scale path when the
  query set is NOT tiny.

All float math is explicitly widened to double *before* multiplying
and summed in array order, making Spark and DuckDB bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xhtmlkit_spark.functions.binding import bind

__all__ = [
    "cosine",
    "dot",
    "unit_vector",
    "brute_force_topk",
    "hyperplane_signature",
    "hyperplane_neardup_pairs",
    "ivf_centroids",
    "kmeans_centroids",
    "ivf_ann_topk",
    "lsh_ann_topk",
    "build_ivf_index",
    "ivf_query_topk",
]


def _dvec(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def _has_direction(vec_col: str) -> Column:
    """True iff the vector is non-NULL with at least one non-zero
    component (⟺ norm > 0): the CHEAP pre-filter for zero-norm/NULL
    vectors — one array scan, no sqrt, and crucially no duplicated
    unit_vector evaluation when Catalyst pushes the predicate below
    the projection."""
    return F.exists(F.col(vec_col), lambda x: x != 0)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; double math, sequential sums (oracle-exact).

    Both double-cast vectors are let-bound (dot product and norm each
    reference them again — captured directly they'd be re-cast per use).
    """
    zero = F.lit(0.0)

    def body(p: Column) -> Column:
        da, db = p["a"], p["b"]
        dot = F.aggregate(
            F.zip_with(da, db, lambda x, y: x * y), zero, lambda s, v: s + v
        )
        na = F.sqrt(
            F.aggregate(F.transform(da, lambda x: x * x), zero, lambda s, v: s + v)
        )
        nb = F.sqrt(
            F.aggregate(F.transform(db, lambda x: x * x), zero, lambda s, v: s + v)
        )
        return dot / (na * nb)

    return bind(F.struct(_dvec(a).alias("a"), _dvec(b).alias("b")), body)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two double arrays (sequential sum, oracle-exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )


def unit_vector(vec: Column | str) -> Column:
    """L2-normalize a vector column (cast to double); an ALL-ZERO
    vector normalizes to NULL — without the norm guard, a single
    zero-norm embedding anywhere in the corpus kills the whole job
    under ANSI mode (DIVIDE_BY_ZERO), and non-ANSI Inf/NaN cosines
    poison rankings instead. Callers filter NULL units exactly like
    NULL embeddings.

    THE pre-step for any pairwise-cosine join: normalizing each row
    once turns per-pair cosine into a bare dot product. Computing
    ``cosine(a, b)`` inside an n² join redoes both norms and both
    double-casts per PAIR — measured 30x slower on the all-pairs
    near-dup query. Norm and vector are let-bound (``bind``) so the
    division doesn't re-run either per element.
    """
    c = F.col(vec) if isinstance(vec, str) else vec

    def with_norm(p: Column) -> Column:
        # the WHEN guard also prevents the division from ever
        # evaluating for zero norms (ANSI-safe)
        return F.when(
            p["n"] > 0, F.transform(p["v"], lambda x: x / p["n"])
        )

    def body(dv: Column) -> Column:
        n = F.sqrt(
            F.aggregate(F.transform(dv, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
        )
        return bind(F.struct(dv.alias("v"), n.alias("n")), with_norm)

    return bind(_dvec(c), body)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (queries broadcast).

    Both sides are unit-normalized per ROW before the join, so the
    per-pair work is a bare dot product (cosine() per pair would redo
    both norms and double-casts |queries| times per corpus vector)."""
    # zero-norm/NULL vectors have no direction: drop them from both
    # sides by testing the RAW vector (exists(x != 0) ⟺ norm > 0).
    # Filtering on the computed unit column instead gets push-down-
    # rewritten by Catalyst into a second full normalization per row
    # (no cross-operator CSE — the binding.py trap in filter form).
    has_dir = _has_direction(vec_col)
    q = queries.where(has_dir).select(
        F.col(id_col).alias("query_id"), unit_vector(vec_col).alias("q_u")
    )
    v = vectors.where(has_dir).select(
        F.col(id_col).alias("neighbor_id"), unit_vector(vec_col).alias("n_u")
    )
    scored = v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(dot(F.col("q_u"), F.col("n_u")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )


def hyperplane_signature(
    vec: Column, n_planes: int = 8, dim: int = 64, salt: str | None = None
) -> Column:
    """Random-hyperplane LSH signature as an int (bit j = sign of ⟨v, h_j⟩).

    Plane component h_j[i] ∈ {-1, +1}, derived from md5(f"{j}_{i}")
    (md5(f"{salt}_{j}_{i}") when ``salt`` is given — independent plane
    sets for multi-probe recall) — deterministic, engine-portable, and
    integer-exact to reproduce.
    """
    import hashlib

    prefix = "" if salt is None else f"{salt}_"

    # let-bind the double-cast vector: the n_planes projections below
    # would each re-cast it when captured directly
    def body(dv: Column) -> Column:
        bits = []
        for j in range(n_planes):
            # per-plane ±1 weights as a literal array (computed in Python
            # at plan-build time from the same md5 rule the oracle SQL uses)
            ws = [
                1
                if int(hashlib.md5(f"{prefix}{j}_{i}".encode()).hexdigest()[:2], 16) % 2
                == 1
                else -1
                for i in range(dim)
            ]
            warr = F.array(*[F.lit(float(w)) for w in ws])
            proj = F.aggregate(
                F.zip_with(dv, warr, lambda x, w: x * w),
                F.lit(0.0),
                lambda s, v: s + v,
            )
            bits.append(F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out.cast("int")

    return bind(_dvec(vec), body)


def hyperplane_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 8,
    n_plane_sets: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs via hyperplane-bucket candidates + exact
    cosine verify — the scale path that replaces the all-pairs O(n²)
    self-join (which Catalyst executes as a nested-loop over the full
    cross product; correct at 500 vectors, a non-starter at 10^12).

    Candidates come from ``n_plane_sets`` independent salted plane
    sets: a pair is considered when ALL ``n_planes`` sign bits agree in
    at least one set (equi-join per set, union, distinct). Expected
    bucket size is |corpus| / 2^n_planes per set, so join cost stays
    Σ bucket² — bounded by construction. Recall is probabilistic:
    P(found) = 1 - (1 - (1 - θ/π)^n_planes)^n_plane_sets, ≈ 0.99+ for
    true near-dups (cos ≥ 0.99) at the defaults and intentionally low
    for mid-similarity pairs; raise n_plane_sets (more recall, more
    candidate cost) or lower n_planes (more recall, bigger buckets —
    watch the bucket² term) to tune.

    Returns (id_a, id_b, cos_sim) with id_a < id_b, cos_sim > threshold.
    """
    # zero-norm vectors: no direction, and they'd all share the
    # all-zero-projection bucket — dropped like NULLs by the raw-vector
    # pre-filter (one array scan; filtering the computed u would make
    # Catalyst re-evaluate the normalization per row)
    sig = vectors.where(_has_direction(vec_col)).select(
        F.col(id_col).alias("id"),
        unit_vector(vec_col).alias("u"),
        *[
            hyperplane_signature(F.col(vec_col), n_planes, dim, salt=f"p{s}").alias(
                f"b{s}"
            )
            for s in range(n_plane_sets)
        ],
    )
    # candidate ids only (no vectors through the shuffle): per-set
    # bucket equi-joins, unioned and deduped; the (tiny) candidate set
    # then fetches each side's unit vector with two hash joins
    ids = sig.select("id", *[f"b{s}" for s in range(n_plane_sets)])
    cand = None
    for s in range(n_plane_sets):
        a, b = ids.alias("a"), ids.alias("b")
        p = a.join(
            b,
            (F.col(f"a.b{s}") == F.col(f"b.b{s}")) & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        cand = p if cand is None else cand.union(p)
    pairs = cand.distinct()
    uv = sig.select("id", "u")
    return (
        pairs.join(uv.withColumnsRenamed({"id": "id_a", "u": "u_a"}), "id_a")
        .join(uv.withColumnsRenamed({"id": "id_b", "u": "u_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("u_a"), F.col("u_b")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") > threshold)
    )


def ivf_centroids(n_cells: int = 16, dim: int = 64) -> list:
    """Deterministic unit centroids for the IVF coarse quantizer.

    Component j,i ∈ [-1, 1] from md5(f"c{j}_{i}") (same engine-portable
    rule family as the hyperplanes), L2-normalized in Python doubles.
    Data-independent ON PURPOSE: both the Spark plan and the DuckDB
    oracle bake the SAME literal values, giving bit-identical cell
    assignment — a k-means-learned quantizer would need the oracle to
    reproduce iterative float means, where summation order breaks
    cross-engine equality. At production scale, swap in sampled k-means
    centroids via the ``centroids`` argument of :func:`ivf_ann_topk`
    (the search path is identical).
    """
    import hashlib
    import math

    out = []
    for j in range(n_cells):
        raw = [
            (int(hashlib.md5(f"c{j}_{i}".encode()).hexdigest()[:4], 16) / 65535.0)
            * 2.0
            - 1.0
            for i in range(dim)
        ]
        norm = math.sqrt(sum(x * x for x in raw))
        out.append([x / norm for x in raw])
    return out


def kmeans_centroids(
    vectors: DataFrame,
    n_cells: int = 16,
    iters: int = 5,
    sample_rows: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Spherical k-means on a bounded, deterministic driver sample —
    the LEARNED coarse quantizer for :func:`ivf_ann_topk`.

    Sample = the ``sample_rows`` smallest ids (order-independent, like
    bpe_stage's rule); init = the first ``n_cells`` sample vectors;
    ``iters`` Lloyd rounds of assign-by-max-dot → mean → re-normalize,
    all in Python doubles (deterministic across runs). Empty clusters
    keep their previous centroid. Learned centroids adapt cell sizes to
    the data distribution (random centroids give uneven inverted lists
    on clustered embeddings); the price is that no SQL oracle can
    reproduce the training, so queries using them are rows-only —
    which is why the CONTRACT query uses the deterministic
    :func:`ivf_centroids` instead.
    """
    import math

    rows = (
        vectors.where(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_rows)
        .collect()
    )

    def unit(v):
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    sample = [unit([float(x) for x in r[vec_col]]) for r in rows]
    if len(sample) < n_cells:
        raise ValueError(f"need >= {n_cells} sample vectors, got {len(sample)}")
    cents = [list(v) for v in sample[:n_cells]]
    dim = len(cents[0])
    for _ in range(iters):
        sums = [[0.0] * dim for _ in range(n_cells)]
        counts = [0] * n_cells
        for v in sample:
            best_j, best_d = 0, -2.0
            for j, c in enumerate(cents):
                d = sum(a * b for a, b in zip(v, c))
                if d > best_d:
                    best_j, best_d = j, d
            counts[best_j] += 1
            sj = sums[best_j]
            for i, x in enumerate(v):
                sj[i] += x
        for j in range(n_cells):
            if counts[j]:
                cents[j] = unit([x / counts[j] for x in sums[j]])
    return cents


def _cell_rank_col(u: Column, cents: list) -> Column:
    """Cells ranked by descending dot(u, centroid): (-dot, idx)
    structs sorted ascending, first-index tie-break — EXACTLY what the
    contract oracle's list_sort over {d, i} structs does."""
    entries = []
    for j, c in enumerate(cents):
        warr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(u, warr, lambda x, w: x * w),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        entries.append(F.struct((-d).alias("d"), F.lit(j).alias("i")))

    def cmp(x: Column, y: Column) -> Column:
        return (
            F.when(x["d"] < y["d"], F.lit(-1))
            .when(x["d"] > y["d"], F.lit(1))
            .when(x["i"] < y["i"], F.lit(-1))
            .when(x["i"] > y["i"], F.lit(1))
            .otherwise(F.lit(0))
        )

    return F.array_sort(F.array(*entries), cmp)


def ivf_ann_topk(
    vectors: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroids: list | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest
    centroid cell (inverted lists), then exact cosine top-k where a
    query's ``nprobe`` best cells meet the corpus's best cell.

    The complementary scale path to sign-bucket LSH: cell count (and
    therefore inverted-list length |corpus|/n_cells) is a direct knob,
    and multi-probe recovers recall near cell boundaries — the classic
    IVF search shape. Join cost is nprobe × Σ cell²/|corpus| style,
    never all-pairs; a probe list never matches the same neighbor
    twice (a neighbor lives in exactly one cell and probes are
    distinct). Returns (query_id, rnk, neighbor_id, cos_sim).

    Measured recall@5 vs brute_force_topk ground truth (learned kmeans
    centroids, 8 clusters × 25 vectors, 32-dim, per-component gaussian
    noise σ relative to unit axes; pinned by
    test_ivf_learned_quantizer_recall_vs_brute_force):

        σ=0.7: nprobe=1 → 0.951, nprobe=2 → 1.000
        σ=1.0: nprobe=1 → 0.945, nprobe=2 → 0.993, nprobe=3 → 1.000

    Knobs: n_cells trades inverted-list length (|corpus|/n_cells per
    cell ⇒ join cost) against boundary losses; nprobe buys those
    boundary cases back linearly in probe-side join volume. Start at
    n_cells ≈ √|corpus|, nprobe=2.
    """
    cents = centroids if centroids is not None else ivf_centroids(n_cells, dim)

    def cell_ranking(u: Column) -> Column:
        return _cell_rank_col(u, cents)

    # zero-norm vectors: no direction, no cell — dropped like NULLs by
    # the raw-vector pre-filter (see _has_direction)
    base = vectors.where(_has_direction(vec_col)).select(
        F.col(id_col).alias("id"),
        unit_vector(vec_col).alias("u"),
    )
    # u referenced by all n_cells dot products → let-bound via the
    # materialized column (withColumn), not recomputed per centroid.
    # The ranking feeds TWO consumers (corpus cells and probe lists);
    # left lazy, the n_cells×dim scoring expression is planned,
    # code-generated and EXECUTED twice (the two-consumer-subtree
    # trap) — so materialize the slim (id, u, cells) projection once.
    # cells keeps only the nprobe best cell ids: cells[0] is the home
    # cell, the full slice is the probe list; payload per row is the
    # unit vector plus nprobe ints, never the 16-struct ranking.
    ranked = (
        base.withColumn("sd", cell_ranking(F.col("u")))
        .select(
            "id",
            "u",
            F.slice(
                F.transform("sd", lambda e: e["i"]), 1, max(nprobe, 1)
            ).alias("cells"),
        )
        .localCheckpoint(eager=False)
    )
    corpus = ranked.select("id", "u", F.col("cells")[0].alias("cell"))
    probes = ranked.select(
        "id",
        "u",
        F.explode(F.slice("cells", 1, nprobe)).alias("cell"),
    )
    p, c = probes.alias("p"), corpus.alias("c")
    scored = p.join(
        c, (F.col("p.cell") == F.col("c.cell")) & (F.col("p.id") != F.col("c.id"))
    ).select(
        F.col("p.id").alias("query_id"),
        F.col("c.id").alias("neighbor_id"),
        F.round(dot(F.col("p.u"), F.col("c.u")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )


def lsh_ann_topk(
    vectors: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ANN: exact cosine top-k *within* each hyperplane bucket.

    At 10^12 scale this is the join that replaces the quadratic one:
    docs meet only when all n_planes sign bits agree (expected bucket
    size |corpus| / 2^n_planes). ``dim`` MUST match the embedding
    width: shorter planes leave trailing components unprojected, and a
    plane longer than the vector null-poisons every projection so all
    rows share bucket 0 — the quadratic join this function exists to
    avoid.
    """
    # null vectors all project to 0 on every plane → they'd share
    # bucket 0 (one overfull bucket at scale) yet rank with null cosine
    # unit-normalize once per row (bucket sign is normalization-
    # invariant, so the signature still uses the raw vector); in-bucket
    # scoring is then a bare dot product per pair
    # zero-norm vectors: no direction — dropped like NULLs by the
    # raw-vector pre-filter (they'd otherwise pile into the
    # all-zero-projection bucket 0)
    sig = vectors.where(_has_direction(vec_col)).select(
        F.col(id_col).alias("id"),
        unit_vector(vec_col).alias("u"),
        hyperplane_signature(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    scored = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("query_id"),
            F.col("b.id").alias("neighbor_id"),
            F.round(dot(F.col("a.u"), F.col("b.u")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )


def build_ivf_index(
    vectors: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroids: list | None = None,
    learn: bool = True,
) -> dict:
    """Materialize the IVF index on disk — the build/query split a
    production ANN service actually runs (index once, query many):

    * ``path/cells`` — (id, u, cell) parquet PARTITIONED BY cell, so
      each inverted list is its own partition directory and a probe
      becomes a partition-PRUNED read (query cost ∝ probed lists, not
      corpus size);
    * ``path/centroids`` — the ≤ ``n_cells`` quantizer rows.

    ``centroids`` may be supplied; otherwise k-means-learned from a
    bounded driver sample (``learn=True``, the production default) or
    the deterministic engine-portable grid. Zero-norm/NULL vectors are
    dropped at build (no direction, no cell). The vector count rides
    the write via ``observe()`` — no extra scan.
    """
    from pyspark.sql import Observation

    if centroids is None:
        centroids = (
            kmeans_centroids(vectors, n_cells, id_col=id_col, vec_col=vec_col)
            if learn
            else ivf_centroids(n_cells, dim)
        )
    base = vectors.where(_has_direction(vec_col)).select(
        F.col(id_col).alias("id"), unit_vector(vec_col).alias("u")
    )
    assigned = base.withColumn("cell", _cell_rank_col(F.col("u"), centroids)[0]["i"])
    obs = Observation("ivf_index_build")
    (
        assigned.observe(obs, F.count(F.lit(1)).alias("n_vectors"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path + "/cells")
    )
    spark = vectors.sparkSession
    spark.createDataFrame(
        [(j, [float(x) for x in c]) for j, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
    return {
        "path": path,
        "n_cells": len(centroids),
        "n_vectors": obs.get["n_vectors"] or 0,
    }


def ivf_query_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a :func:`build_ivf_index` index: rank cells per query,
    read ONLY the probed inverted lists, exact in-cell cosine, per-
    query top-k. Returns (query_id, rnk, neighbor_id, cos_sim); a
    corpus vector sharing the query's id is excluded (self-match).

    Scale shape: the centroid table (≤ n_cells rows) and the distinct
    probed-cell set (≤ n_cells ints) are the ONLY driver collects —
    both bounded by the quantizer size, independent of corpus and
    query volume. The probed set becomes a LITERAL isin filter on the
    partition column, so the cells scan shows PartitionFilters and
    touches just those directories (plan-asserted in the test); the
    probe join is broadcast (query batches are small next to the
    corpus — for corpus-sized query sets use :func:`ivf_ann_topk`,
    which co-shuffles instead).
    """
    cents = [
        r["centroid"]
        for r in spark.read.parquet(path + "/centroids").orderBy("cell").collect()
    ]
    q = queries.where(_has_direction(vec_col)).select(
        F.col(id_col).alias("qid"), unit_vector(vec_col).alias("qu")
    )
    probes = q.withColumn("sd", _cell_rank_col(F.col("qu"), cents)).select(
        "qid",
        "qu",
        F.explode(F.slice(F.transform("sd", lambda e: e["i"]), 1, nprobe)).alias(
            "cell"
        ),
    ).localCheckpoint(eager=True)  # ranked once; reused for pruning + join
    probed = sorted(r["cell"] for r in probes.select("cell").distinct().collect())
    cells = spark.read.parquet(path + "/cells").where(F.col("cell").isin(probed))
    p, c = probes.alias("p"), cells.alias("c")
    scored = (
        F.broadcast(p)
        .join(c, (F.col("p.cell") == F.col("c.cell")) & (F.col("p.qid") != F.col("c.id")))
        .select(
            F.col("p.qid").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            F.round(dot(F.col("p.qu"), F.col("c.u")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )
