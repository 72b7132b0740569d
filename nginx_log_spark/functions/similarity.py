"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — F.aggregate/zip_with dot products,
  fully JVM-side, planned as TakeOrderedAndProject (bounded heap). The
  correct baseline, and at 100 TB still the right *verifier* for ANN.
- lsh_ann_topk: random-hyperplane LSH — deterministic ±1 hyperplanes derived
  from md5(plane, dim), bucket = sign bits. Probing only the query's bucket
  turns a full scan into a partition-pruned scan when the table is written
  partitioned/bucketed by the sketch.
- embedding_neardup_pairs: all pairs with cosine >= threshold, bucketed by
  the same sketch so the self-join is per-bucket, not O(n^2) global.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm_col(a) * _norm_col(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), q)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _hyperplane(plane: int, dim: int) -> float:
    """Deterministic ±1 weight from md5 — reproducible on any engine."""
    h = hashlib.md5(f"hp:{plane}:{dim}".encode()).digest()[0]
    return 1.0 if h & 1 else -1.0


def sketch_col(vec: Column, dims: int, n_planes: int = 8) -> Column:
    """Random-hyperplane sign sketch -> int bucket in [0, 2^n_planes)."""
    total = F.lit(0)
    for p in range(n_planes):
        w = F.array(*[F.lit(_hyperplane(p, d)) for d in range(dims)])
        bit = F.when(_dot(vec.cast("array<double>"), w) > 0, F.lit(1)).otherwise(F.lit(0))
        total = total + bit * F.lit(2**p)
    return total.cast("int")


def lsh_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
) -> DataFrame:
    """ANN: restrict the exact cosine scan to the query's LSH bucket.

    Recall < 1 by design; bench compares it against cosine_topk. At scale
    the bucket becomes a partition filter => partition pruning at the scan.
    """
    dims = len(query_vec)
    # sequential left-fold, NOT numpy dot: bit-parity with Spark's
    # F.aggregate fold and DuckDB's list_sum on sign-threshold edge cases
    qbucket = _query_bucket(query_vec, n_planes)
    bucketed = df.withColumn("_bucket", sketch_col(F.col(vec_col), dims, n_planes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), q)
    return (
        bucketed.filter(F.col("_bucket") == qbucket)
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _query_bucket(query_vec: list[float], n_planes: int) -> int:
    """Driver-side sketch of the query vector — same sequential fold as
    sketch_col, so it agrees bit-for-bit with the executor-side buckets."""
    qbucket = 0
    for p in range(n_planes):
        acc = 0.0
        for d in range(len(query_vec)):
            acc += float(query_vec[d]) * _hyperplane(p, d)
        if acc > 0:
            qbucket |= 1 << p
    return qbucket


def multiprobe_buckets(query_vec: list[float], n_planes: int, probe_bits: int = 1) -> list[int]:
    """The query's bucket plus every bucket within `probe_bits` bit flips —
    standard multi-probe LSH (a flipped bit covers a plane whose projection
    was near zero). Returned as an EXPLICIT value list so the filter stays
    a partition-pruning IN-predicate on a materialized index."""
    from itertools import combinations

    q = _query_bucket(query_vec, n_planes)
    probes = [q]
    for r in range(1, probe_bits + 1):
        for bits in combinations(range(n_planes), r):
            m = q
            for b in bits:
                m ^= 1 << b
            probes.append(m)
    return probes


def lsh_ann_topk_multiprobe(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    probe_bits: int = 1,
) -> DataFrame:
    """Multi-probe ANN: exact cosine over the query bucket AND its
    probe_bits-flip neighbors. Recall rises toward exact as probe_bits
    grows (probe_bits = n_planes scans everything); cost is
    |probed buckets| / 2^n_planes of the table."""
    probes = multiprobe_buckets(query_vec, n_planes, probe_bits)
    dims = len(query_vec)
    bucketed = df.withColumn("_bucket", sketch_col(F.col(vec_col), dims, n_planes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), q)
    return (
        bucketed.filter(F.col("_bucket").isin(probes))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def write_bucketed_embeddings(
    df: DataFrame,
    path: str,
    dims: int,
    vec_col: str = "embedding",
    n_planes: int = 6,
    mode: str = "overwrite",
) -> str:
    """Materialize the LSH index: sketch once, write PARTITIONED BY the
    bucket. At 100 TB this is the whole point of the sketch — each ANN
    query then reads exactly one partition directory (partition pruning at
    the scan), instead of re-sketching the full table per query."""
    bucketed = df.withColumn("_bucket", sketch_col(F.col(vec_col), dims, n_planes))
    bucketed.write.mode(mode).partitionBy("_bucket").parquet(path)
    return path


def lsh_ann_topk_prebucketed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    probe_bits: int = 0,
) -> DataFrame:
    """ANN over a pre-bucketed table: the bucket predicate is a PARTITION
    filter — Spark prunes every other bucket's files at planning time, so
    the scan cost is |probed buckets|, not |table| (verify via
    .explain: PartitionFilters [_bucket IN (...)]).

    probe_bits=0 probes only the query's bucket; probe_bits>=1 is
    multi-probe (the bucket plus all <=probe_bits-flip neighbors) — still
    an explicit IN-list, so pruning survives."""
    probes = multiprobe_buckets(query_vec, n_planes, probe_bits)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), q)
    return (
        spark.read.parquet(path)
        .filter(F.col("_bucket").isin(probes))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _py_cosine(a: list[float], b: list[float]) -> float:
    """Driver-side cosine with the SAME sequential left-fold order as
    cosine_sim's F.aggregate — IEEE-identical results, so driver-side
    probe selection agrees bit-for-bit with the executor-side assignment."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    return dot / ((na**0.5) * (nb**0.5))


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "cell",
) -> DataFrame:
    """IVF coarse quantization: nearest-centroid (max rounded cosine,
    centroid-id tiebreak) cell id per vector, as a PURE PROJECTION.

    The centroid list is embedded as literal arrays (it is tiny — the coarse
    quantizer of a 10^12-vector index is 2^10..2^16 centroids), so the
    assignment is scan-speed: no shuffle, no window, no join. argmax via
    array_max over (sim, -cid) structs — struct ordering is lexicographic,
    so ties resolve to the smallest centroid id. At scale the assignment is
    computed once and the table written partitioned by cell
    (write_ivf_index), making every query a partition-pruned scan."""
    entries = []
    for cid, cvec in centroids:
        c = F.array(*[F.lit(float(x)) for x in cvec])
        sim = F.round(cosine_sim(F.col(vec_col).cast("array<double>"), c), 6)
        entries.append(F.struct(sim.alias("s"), F.lit(-cid).alias("negcid")))
    best = F.array_max(F.array(*entries))
    return df.withColumn(cell_col, (-best["negcid"]).cast("int"))


def seed_centroids(
    df: DataFrame,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Deterministic seed centroids: the n_centroids smallest-id vectors
    (by sort order, so sparse or non-zero-based id spaces still yield
    exactly n_centroids). A production index would refine these with
    k-means rounds (assign via ivf_assign, then groupBy(cell).agg(avg per
    dim) — the same join-free shapes); the seed rule keeps the oracle
    reproducible in SQL."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()  # driver-sized: <= n_centroids vectors (quantizer state)
    )
    if not rows:
        raise ValueError("seed_centroids: input has no vectors — cannot build an IVF quantizer")
    return [(int(r[0]), list(r[1])) for r in rows]


def ivf_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: probe the n_probe cells whose centroids are closest to the
    query, exact-rerank inside them. Recall < 1 by design (vs cosine_topk);
    the scan is |probed cells| / |table| of the data — and with the index
    materialized partitioned-by-cell, a partition-pruned read."""
    cents = seed_centroids(df, n_centroids, vec_col, id_col)
    ranked = sorted(
        ((round(_py_cosine(query_vec, cvec), 6), -cid) for cid, cvec in cents),
        reverse=True,
    )
    probe = [-negcid for _, negcid in ranked[:n_probe]]
    assigned = ivf_assign(df, cents, vec_col, id_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), q)
    return (
        assigned.filter(F.col("cell").isin(probe))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def write_ivf_index(
    df: DataFrame,
    path: str,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF index: assign cells once, write partitioned by
    cell. Queries over the written table filter cell IN (probes) — a
    partition filter, so Spark prunes every unprobed cell's files at
    planning time. Returns the centroid list (the query-side quantizer)."""
    cents = seed_centroids(df, n_centroids, vec_col, id_col)
    ivf_assign(df, cents, vec_col, id_col).write.mode(mode).partitionBy(
        "cell"
    ).parquet(path)
    return cents


def ivf_kmeans_refine(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    rounds: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> list[tuple[int, list[float]]]:
    """Lloyd k-means rounds over the IVF quantizer: assign every vector to
    its nearest centroid (ivf_assign — a pure projection, no shuffle), then
    move each centroid to its cell's mean. The per-cell mean uses EXACT
    integer arithmetic — components are fixed-point-scaled to bigints,
    summed (integer sums commute, so any partition order gives the same
    bits), divided once — never an order-dependent double accumulation, so
    the refined quantizer is bit-identical on any cluster size or engine.

    Scale shape per round: one scan + one groupBy with n_centroids groups
    and dims sum columns (map-side combined to ~|cells| rows/partition);
    the quantizer itself stays driver-side (it is the tiny object every
    IVF query needs anyway). Empty cells keep their previous centroid —
    the standard Lloyd convention."""
    cents = list(centroids)
    dims = len(cents[0][1])
    for _ in range(rounds):
        assigned = ivf_assign(df, cents, vec_col, id_col)
        sums = [
            F.sum(
                F.round(F.get(F.col(vec_col).cast("array<double>"), d) * scale)
                .cast("long")
            ).alias(f"s{d}")
            for d in range(dims)
        ]
        rows = (
            assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            # driver-sized: one row per IVF cell (O(n_centroids) quantizer
            # state per k-means round), never per-vector data
            .collect()
        )
        by_cell = {int(r["cell"]): r for r in rows}
        new_cents = []
        for cid, old in cents:
            r = by_cell.get(cid)
            if r is None or r["n"] == 0:
                new_cents.append((cid, old))
            else:
                new_cents.append(
                    (cid, [r[f"s{d}"] / scale / r["n"] for d in range(dims)])
                )
        cents = new_cents
    return cents


def ivf_ann_topk_indexed(
    spark,
    path: str,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN over a materialized index (write_ivf_index): rank the
    centroids against the query DRIVER-side (the quantizer is tiny), then
    read only the n_probe nearest cells — `cell IN (probes)` is a PARTITION
    filter on the written table, so Spark prunes every unprobed cell's
    files at planning time and the exact rerank scans |probed cells| rows."""
    ranked = sorted(
        ((round(_py_cosine(query_vec, cvec), 6), -cid) for cid, cvec in centroids),
        reverse=True,
    )
    probe = [-negcid for _, negcid in ranked[:n_probe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), q)
    return (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(probe))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    exact: bool = False,
    dims: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine similarity.

    exact=True: full a<b cross join (oracle-checkable; small inputs only).
    exact=False: self-join per LSH bucket — near-identical vectors land in
    the same bucket with high probability, so the join is bucket-local.
    Pass `dims` for the bucketed path; plan construction runs NO job.

    Norms are computed ONCE per row in a projection BEFORE the pair join
    (each row's norm would otherwise be re-derived against every partner:
    2 of the 3 per-pair array traversals for free) — same IEEE ops, same
    order, so the rounded cosine is bit-identical to the inline form.
    """
    from nginx_log_spark.functions._parallel import ensure_parallelism

    # fan-out guard: a single-split embedding table would run the whole
    # pair join (and its per-pair dot-product folds) in one task
    prep = ensure_parallelism(df).select(
        id_col, vec_col,
        _norm_col(F.col(vec_col).cast("array<double>")).alias("_vnorm"),
    )
    if exact:
        a, b = prep.alias("a"), prep.alias("b")
        join_cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        joined = a.join(b, join_cond)
    else:
        if dims is None:
            raise ValueError(
                "embedding_neardup_pairs(exact=False) requires dims= — "
                "inferring it would run a driver-side job at plan-build time"
            )
        bk = prep.withColumn("_bucket", sketch_col(F.col(vec_col), dims, n_planes))
        a, b = bk.alias("a"), bk.alias("b")
        joined = a.join(
            b,
            (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
    sim = _dot(
        F.col(f"a.{vec_col}").cast("array<double>"),
        F.col(f"b.{vec_col}").cast("array<double>"),
    ) / (F.col("a._vnorm") * F.col("b._vnorm"))
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public): drop
    semantically redundant rows by (1) coarse k-means cells (ivf_assign —
    a pure scan-speed projection against the broadcast-literal quantizer),
    (2) cosine pairs >= threshold WITHIN each cell only (the self-join is
    per-cell, never global — at 10^12 vectors the cell count scales with
    the corpus so per-cell volume stays bounded; same layout the IVF index
    already materializes), (3) greedy min-id retention (the paper keeps the
    vector farthest from the centroid; min-id is the cross-engine-
    deterministic choice, same rule as dedup_keep).

    Returns the kept rows of `df` (all original columns). Reference scope
    note: the reference has no similarity ops at all (SURVEY.md §2.7); this
    is LLM-pipeline surface.
    """
    assigned = ivf_assign(df, centroids, vec_col, id_col).select(
        F.col(id_col), F.col(vec_col), F.col("cell")
    )
    a = assigned.select(
        F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va"), "cell"
    )
    b = assigned.select(
        F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb"), "cell"
    )
    sim = F.round(
        cosine_sim(F.col("_va").cast("array<double>"), F.col("_vb").cast("array<double>")), 6
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(sim >= threshold)
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")


def hashed_tf(
    df: DataFrame,
    dims: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick sparse term frequencies (Weinberger et al. 2009,
    public): every normalized word maps to one of ``dims`` buckets through
    the repo's portable md5 hash (same expression in the DuckDB oracle),
    so the feature space is fixed-width with NO vocabulary state — the
    property that makes text featurization embarrassingly parallel at
    10^12 docs. Returns the sparse representation (id, bucket, tf): the
    relational form, which downstream joins/aggregations keep sparse
    instead of materializing dims-wide dense arrays per row.

    Scale shape: one explode (volume = text volume) + one map-side-
    combined groupBy on uniform (id, bucket) keys. No join, no skew;
    the only other exchange is the tiny-input fan-out guard (a no-op on
    multi-split inputs).
    """
    from nginx_log_spark.functions._parallel import ensure_parallelism

    nrm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    # fan-out guard: single-split corpora otherwise explode in one task
    words = ensure_parallelism(df).select(
        F.col(id_col), F.explode(F.split(nrm, " ")).alias("_w")
    ).filter(F.length("_w") > 0)
    bucket = F.pmod(
        F.conv(F.substring(F.md5("_w"), 1, 8), 16, 10).cast("long"), F.lit(dims)
    )
    return words.select(id_col, bucket.alias("bucket")).groupBy(
        id_col, "bucket"
    ).agg(F.count(F.lit(1)).alias("tf"))


def tfidf_cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    dims: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classic sparse TF-IDF cosine retrieval straight off the text column
    — the text-side twin of cosine_topk (which needs a pretrained embedding
    column): find the ``k`` docs most similar to ``query_id`` under hashed
    bag-of-words with smoothed idf = ln((N+1)/(df+1)) + 1 (scikit-learn's
    convention, public). Everything stays RELATIONAL — the dot product is
    a join on the bucket key, never a dims-wide dense array per row.

    Returns (id, cosine) with cosine rounded to 6dp, (cosine desc, id asc)
    ordered, query excluded.

    Scale shape at 100 TB: tf is one explode+groupBy (uniform keys); df
    and idf aggregate to <= dims rows; the query vector is <= dims rows —
    BOTH broadcast. The corpus-side weight table shuffles once for the
    by-doc norm and once joins the broadcast query on bucket; the top-k is
    TakeOrderedAndProject. Nothing ever pairs docs against docs.
    """
    tf = hashed_tf(df, dims, text_col, id_col)
    # tf feeds four disconnected subtrees (document frequencies, the
    # weight table's three consumers) — without materialization the full
    # tokenize+hash explode re-runs per subtree. (id, bucket, tf) is a
    # lightweight proxy of the corpus, so one localCheckpoint replaces
    # four corpus passes with one.
    tf = tf.localCheckpoint(eager=True)
    n_docs = df.select(F.count(F.lit(1)).alias("n"))
    dfreq = tf.groupBy("bucket").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "bucket",
        (F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1).alias("idf"),
    )
    w = tf.join(F.broadcast(idf), "bucket").select(
        id_col, "bucket", (F.col("tf") * F.col("idf")).alias("w")
    )
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    qw = w.filter(F.col(id_col) == query_id).select(
        F.col("bucket"), F.col("w").alias("qw")
    )
    qnorm = norms.filter(F.col(id_col) == query_id).select(
        F.col("norm").alias("qnorm")
    )
    dots = (
        w.join(F.broadcast(qw), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    return (
        dots.join(norms, id_col)
        .crossJoin(F.broadcast(qnorm))
        .filter(F.col(id_col) != query_id)
        .select(
            id_col,
            F.round(F.col("dot") / (F.col("norm") * F.col("qnorm")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
