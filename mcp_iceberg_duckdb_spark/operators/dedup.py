"""Deduplication operators (tier X — SURVEY.md §2.11): exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (the 100 TB story):

- exact dedup is a hash-groupBy — one shuffle on the content hash,
  map-side partial aggregation, no driver involvement.
- MinHash-LSH is the linear-time near-dup path: signature computation
  is embarrassingly parallel (no shuffle), banding explodes each doc
  into B rows, and the candidate join shuffles on (band, band_hash) —
  candidates are generated bucket-locally, never all-pairs. A bucket
  size cap bounds the quadratic blowup a degenerate bucket (e.g. the
  empty document) would cause; production tuning = more bands/rows.
- brute-force pair generation (n-gram Jaccard, cosine) exists only
  behind *blocking keys* (source, label) as the deterministic
  oracle-checkable twin; the clustering scale path
  (x_dedup_cluster_cc_lsh) consumes LSH candidate pairs instead, so
  no production path is ever O(block²).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.functions.textfns import (
    distinct_tokens,
    jaccard,
    lsh_bands,
    minhash_signature,
    simhash64,
    word_shingles,
)
from mcp_iceberg_duckdb_spark.functions.vector import as_double, cosine
from mcp_iceberg_duckdb_spark.operators._util import parallelize, r6, rn, t
from mcp_iceberg_duckdb_spark.registry import query

# documents: no byte-identical dups are planted, but ~11k pairs share
# ≥90% of their token sets — exact dedup keys on the *normalized*
# content (sorted distinct tokens), the standard "same bag of words"
# canonicalization.


@query(
    "x_dedup_exact",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS content_sig
        FROM documents
    )
    SELECT content_sig, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
    FROM h GROUP BY content_sig
    HAVING count(*) > 1
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_exact(spark, sf_dir):
    """Exact dedup: md5 over canonicalized content (sorted distinct
    tokens), groupBy hash, keep min doc_id. Emits only groups with
    duplicates. One shuffle on the 128-bit hash; at 100 TB the hash
    (16 bytes) shuffles, never the document text."""
    d = t(spark, sf_dir).documents
    sig = F.md5(F.array_join(F.array_sort(distinct_tokens("text")), " "))
    return (
        d.select("doc_id", sig.alias("content_sig"))
        .groupBy("content_sig")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


@query(
    "x_dedup_exact_keep_first",
    oracle="""
    WITH h AS (
        SELECT doc_id, lang, source,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS content_sig
        FROM documents
    )
    SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY content_sig ORDER BY doc_id) AS rn
        FROM h
    ) WHERE rn = 1
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_exact_keep_first(spark, sf_dir):
    """The dedup *materialization*: the surviving corpus (first doc
    per content signature) — what a training-data pipeline actually
    writes out. Window-per-key with rank pushdown, not dropDuplicates,
    so the keeper is deterministic (min doc_id, not "whichever task
    finished first")."""
    d = t(spark, sf_dir).documents
    sig = F.md5(F.array_join(F.array_sort(distinct_tokens("text")), " "))
    from pyspark.sql import Window as W

    w = W.partitionBy("content_sig").orderBy("doc_id")
    return (
        d.select("doc_id", "lang", "source", sig.alias("content_sig"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


# MinHash-LSH parameters: 32 hashes, 8 bands × 4 rows →
# P(candidate) ≈ 1-(1-j⁴)⁸; ≈ .9998 at j=.9, ≈ .89 at j=.7.
_N_HASHES, _N_BANDS, _ROWS = 32, 8, 4
_JACCARD_THRESHOLD = 0.8
_MAX_BUCKET = 200  # degenerate-bucket guard


def lsh_verified_pairs(spark, sf_dir, threshold=_JACCARD_THRESHOLD):
    """Shared sub-quadratic near-dup pair generator: 3-word shingles
    → 32-hash MinHash → 8×4 banding → bucket-local candidate pairs →
    exact-Jaccard verify ≥ threshold. Returns (doc_a, doc_b, jaccard).

    Plan shape: signature stage is shuffle-free; candidates shuffle
    once on (band, hash); verify joins token sets back by doc_id.
    Never all-pairs — this is the pair source the 100 TB paths
    (x_dedup_minhash_lsh, x_dedup_cluster_cc_lsh) build on.
    """
    from mcp_iceberg_duckdb_spark.functions.textfns import bind

    d = t(spark, sf_dir).documents
    # one let-bound evaluation computes the shingle array AND its
    # signature (projecting them as two columns would run the shingle
    # expression twice); persist because three downstream branches
    # (banding + both sides of the verify join) consume it
    both = bind(
        word_shingles("text", 3),
        lambda sh: F.struct(
            sh.alias("sh"), minhash_signature(sh, _N_HASHES).alias("sig")
        ),
    )
    # persist the struct column itself: field-extracting projections
    # placed before the persist would be collapsed back into two
    # evaluations of the struct expression
    cached = parallelize(d).select("doc_id", both.alias("b")).persist()
    docs = cached.select(
        "doc_id", F.col("b.sh").alias("sh"), F.col("b.sig").alias("sig")
    )
    bands = docs.select(
        "doc_id", F.posexplode(lsh_bands(F.col("sig"), _N_BANDS, _ROWS))
    ).toDF("doc_id", "band", "bhash")
    # degenerate-bucket guard: a bucket with B docs yields B² pairs
    from pyspark.sql import Window as W

    bucket_n = F.count("*").over(W.partitionBy("band", "bhash"))
    bands = bands.withColumn("bn", bucket_n).filter(F.col("bn") <= _MAX_BUCKET)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("jaccard", r6(jaccard(F.col("sh_a"), F.col("sh_b"))))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


@query("x_dedup_minhash_lsh", oracle=None, tags=("dedup", "tierx"))
def x_dedup_minhash_lsh(spark, sf_dir):
    """Near-dup detection via lsh_verified_pairs (≥ 0.8). No oracle
    (candidates depend on the hash family); tests assert precision
    = 1.0 and recall ≥ 0.95 vs brute force."""
    return lsh_verified_pairs(spark, sf_dir)


@query("x_dedup_minhash_mllib", oracle=None, tags=("dedup", "tierx"))
def x_dedup_minhash_mllib(spark, sf_dir):
    """The MLlib route to the same near-dup result: shingles →
    HashingTF (binary) → ml.feature.MinHashLSH.approxSimilarityJoin
    at Jaccard distance ≤ 0.2, i.e. similarity ≥ 0.8 over the hashed
    shingle space. Kept alongside the expression pipeline
    (x_dedup_minhash_lsh) as the library path — same banding idea,
    vectorized columns instead of array expressions. Tests assert the
    two agree on the high-similarity pairs."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = t(spark, sf_dir).documents
    docs = parallelize(
        d.select("doc_id", word_shingles("text", 3).alias("sh"))
    ).persist()
    tf = HashingTF(
        inputCol="sh", outputCol="features", binary=True, numFeatures=1 << 18
    )
    feats = tf.transform(docs).filter(
        # MinHashLSH rejects empty vectors
        F.size("sh") > 0
    )
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 0.2, distCol="jdist")
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            rn(1.0 - F.col("jdist"), 6).alias("jaccard_est"),
        )
        .distinct()
    )


@query("x_dedup_simhash", oracle=None, tags=("dedup", "tierx"))
def x_dedup_simhash(spark, sf_dir):
    """SimHash near-dup: 64-bit signature per doc, candidates =
    16-bit band collision, verified at hamming distance ≤ 6. Pure
    expression pipeline (fold over tokens), one shuffle on the band
    key. Property-tested (no oracle — hash-family specific)."""
    d = t(spark, sf_dir).documents
    # persist: the signature feeds 4 band expressions + both join sides
    docs = parallelize(d).select(
        "doc_id", simhash64(distinct_tokens("text")).alias("sh")
    ).persist()
    # 4 bands of 16 bits each: band value = (sh >> (16·b)) & 0xFFFF
    bands = docs.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), 16 * b).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for b in range(4)
                ]
            )
        ).alias("band", "bval"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 6)
    )


@query(
    "x_dedup_ngram_jaccard",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(greatest(len(string_split(text, ' ')) - 2, 1)),
                   i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], ' ')
               )) AS sh
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh)))) * 1e6 + 0.5) / 1e6 AS jaccard
    FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / len(list_distinct(list_concat(a.sh, b.sh)))) * 1e6 + 0.5) / 1e6 >= 0.5
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram (3-word shingle) Jaccard similarity join, blocked
    on `source`: the deterministic, oracle-checkable dedup path.
    Blocking keeps pair generation sub-quadratic (pairs only within a
    block); the unblocked scale path is x_dedup_minhash_lsh."""
    d = t(spark, sf_dir).documents
    docs = d.select("doc_id", "source", word_shingles("text", 3).alias("sh"))
    a, b = docs.alias("a"), docs.alias("b")
    jac = r6(jaccard(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


@query(
    "x_dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           floor((list_cosine_similarity(a.v, b.v)) * 1e6 + 0.5) / 1e6 AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE floor((list_cosine_similarity(a.v, b.v)) * 1e6 + 0.5) / 1e6 >= 0.35
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup, blocked on label: cosine in float64
    via zip_with/aggregate (no UDF), pairs within a block only. The
    unblocked scale path is x_ann_lsh_topk's hyperplane bucketing."""
    e = t(spark, sf_dir).embeddings
    docs = e.select("vec_id", "label", as_double("embedding").alias("v"))
    a, b = docs.alias("a"), docs.alias("b")
    sim = r6(cosine(F.col("a.v"), F.col("b.v")))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.35)
    )


@query(
    "x_dedup_cluster_cc",
    oracle="""
    WITH RECURSIVE d AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(greatest(len(string_split(text, ' ')) - 2, 1)),
                   i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], ' ')
               )) AS sh
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db
        FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh)))) * 1e6 + 0.5) / 1e6 >= 0.5
    ),
    edges AS (
        SELECT da AS src, db AS dst FROM pairs
        UNION
        SELECT db AS src, da AS dst FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
    FROM reach GROUP BY src
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_cluster_cc(spark, sf_dir):
    """Near-dup CLUSTERING, deterministic oracle twin: connected
    components (connected_components min-label loop) over the exact
    n-gram-Jaccard pair graph (same edges as x_dedup_ngram_jaccard).
    Pairs alone under-delete (A~B, B~C but A≁C leaves a duplicate);
    the transitive closure is what a corpus pipeline actually
    deduplicates by. cluster_id = min doc_id in the component, so one
    keeper per cluster falls out for free.

    The source-blocked exact pair join is O(block²) — fine for the
    differential oracle at test scale, wrong at 100 TB where a block
    is the corpus; the production path is x_dedup_cluster_cc_lsh,
    same CC loop fed by sub-quadratic LSH candidate pairs.
    """
    d = t(spark, sf_dir).documents
    docs = d.select("doc_id", "source", word_shingles("text", 3).alias("sh"))
    a, b = docs.alias("a"), docs.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(r6(jaccard(F.col("a.sh"), F.col("b.sh"))) >= 0.5)
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    return connected_components(pairs).toDF("doc_id", "cluster_id")


def connected_components(pairs):
    """Min-label propagation over an undirected pair graph
    (src < dst rows in, (node, label) out; label = component min).

    Each round every node takes the min label across itself and its
    neighbors; labels decrease monotonically, so a round that leaves
    sum(label) unchanged is the fixpoint. Rounds needed = graph
    diameter (near-dup components are tiny cliques → 2-3 rounds);
    each round is one distributed join+groupBy, the driver only
    compares two int64 sums. localCheckpoint every round truncates
    the iterative plan's lineage — without it round N's plan nests N
    joins deep and the optimizer re-walks the whole chain each
    round. The same loop scales to billion-edge graphs where a
    recursive CTE (the DuckDB oracle's transitive closure, O(n·m)
    state) cannot — for web-scale graphs swap in the large-star/
    small-star variant, same loop skeleton."""
    # persist BEFORE the symmetrize-union: both union branches read
    # pairs, so an unpersisted input runs the (expensive) pair
    # generation twice — at scale that doubles the LSH verify join
    pairs = pairs.persist()
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    # seed labels with min(node, min neighbor) — identical to
    # "labels = node" followed by one propagation round, but one
    # checkpoint+sum cheaper; near-dup cliques converge right here
    # and the loop only runs its single confirming round
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nmin"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("nmin")).alias("label"),
        )
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(20):  # ≥ diameter; dup components converge in 2-3
        nmin = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(nmin, labels.node == nmin.src, "left")
            .select(
                F.col("node"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # truncate lineage; prod: checkpoint()
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    pairs.unpersist()
    return labels.select("node", "label")


@query("x_dedup_cluster_cc_lsh", oracle=None, tags=("dedup", "tierx"))
def x_dedup_cluster_cc_lsh(spark, sf_dir):
    """Near-dup clustering at the 100 TB scale: connected components
    over the MinHash-LSH candidate pairs (lsh_verified_pairs,
    exact-Jaccard-verified ≥ 0.8) — edge generation is sub-quadratic
    (bucket-local, never all-pairs), unlike the source-blocked exact
    twin x_dedup_cluster_cc whose O(block²) join exists only as the
    deterministic oracle path. No oracle (the LSH candidate set is
    hash-family-dependent); tests assert cluster precision 1.0 and
    recall vs the brute-force pair graph at the same threshold."""
    pairs = lsh_verified_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return connected_components(pairs).toDF("doc_id", "cluster_id")
