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
- exact pair generation (n-gram Jaccard) runs the prefix-filtered
  AllPairs join (functions/simjoin.py) — deterministic and
  oracle-checkable like a nested-loop join, but sub-quadratic, so NO
  registered plan is ever all-pairs (VERDICT round-2 item 6). The
  hash-family-specific ops (MinHash-LSH, SimHash, LSH-fed CC) are
  registered as DECIDABLE CONTRACTS: one row of exact value-checked
  counts plus precision/recall booleans the DuckDB oracle pins TRUE,
  with the pair/cluster rows still available as module functions.
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
from mcp_iceberg_duckdb_spark.functions.vector import dot as vdot
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


def lsh_verified_pairs(
    spark, sf_dir, threshold=_JACCARD_THRESHOLD,
    n_bands=_N_BANDS, rows=_ROWS,
):
    """Shared sub-quadratic near-dup pair generator: 3-word shingles
    → 32-hash MinHash → n_bands×rows banding (default 8×4, tuned for
    t=0.8; pass 16×2 for a t=0.5 operating point, P(cand)≈0.99 at
    j=0.5) → bucket-local candidate pairs → exact-Jaccard verify ≥
    threshold. Returns (doc_a, doc_b, jaccard).

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
        "doc_id", F.posexplode(lsh_bands(F.col("sig"), n_bands, rows))
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


# Shared SQL fragment: the DuckDB twin of word_shingles(text, 3) —
# distinct 3-word shingles with the same short-doc fallback.
_SHINGLES_SQL = """
        SELECT doc_id,
               list_distinct(list_transform(
                   range(greatest(len(string_split(text, ' ')) - 2, 1)),
                   i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], ' ')
               )) AS sh
        FROM documents
"""

# One-row count of the exact strong-pair set (shingle Jaccard ≥ 0.9,
# unblocked) — the recall baseline every approx-dedup contract pins
# against. Quadratic in DuckDB (fine at oracle scale); the Spark side
# computes the same set sub-quadratically via prefix filtering.
_STRONG_PAIRS_SQL = f"""
    WITH d AS ({_SHINGLES_SQL}),
    s AS (
        SELECT count(*) AS n
        FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh)))) * 1e6 + 0.5) / 1e6 >= 0.9
    )
"""

# DuckDB's OWN MinHash-LSH twin (round-8, the two-sided-contract fix:
# VERDICT r7 "What's wrong" item 1). Instead of pinning the approx
# contracts' booleans as literal TRUE — one-sided, only Spark could
# falsify them — the oracle builds an independent 32-perm MinHash
# (xxhash64 over perm-salted shingles), bands it 8x4 exactly like the
# Spark parameters (_N_HASHES/_N_BANDS/_ROWS), verifies candidates
# with exact Jaccard, and derives the SAME precision/recall/
# co-clustering booleans from its own pipeline. A structurally
# unachievable contract (banding that cannot reach the pinned recall,
# a tolerance tighter than the method) now fails on both engines.
# CTEs provided: d(doc_id, sh), cand(doc_a, doc_b),
# verified(doc_a, doc_b, jac), strong(doc_a, doc_b), ns(n).
# (WITH RECURSIVE so consumers may append recursive CTEs — the
# keyword is harmless for the non-recursive ones.)
# Sweep cost: the strong-pairs CTE is deliberately quadratic (it is
# the ground truth), so the three consumers run ~10-13 s each at the
# driver's sf0.01 gate but ~15 min at sf0.1 (measured 880 s) — for
# sf0.1 oracle sweeps, skip them via SPARK_GRAFT_SWEEP_SKIP.
_LSH_TWIN_SQL = f"""
    WITH RECURSIVE d AS ({_SHINGLES_SQL}),
    shx AS (SELECT doc_id, unnest(sh) AS s FROM d),
    mh AS (
        SELECT doc_id, p.p AS p,
               min(hash(CAST(p.p AS VARCHAR) || ':' || s)) AS mv
        FROM shx, (SELECT unnest(range(32)) AS p) p
        GROUP BY doc_id, p.p
    ),
    bands AS (
        SELECT doc_id, p // 4 AS band,
               hash(string_agg(CAST(mv AS VARCHAR), ',' ORDER BY p)) AS bhash
        FROM mh GROUP BY doc_id, p // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
    ),
    verified AS (
        SELECT c.doc_a, c.doc_b,
               floor((CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(da.sh, db.sh)))) * 1e6 + 0.5) / 1e6 AS jac
        FROM cand c
        JOIN d da ON da.doc_id = c.doc_a
        JOIN d db ON db.doc_id = c.doc_b
    ),
    strong AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh)))) * 1e6 + 0.5) / 1e6 >= 0.9
    ),
    ns AS (SELECT count(*) AS n FROM strong)
"""


def shingled_docs(spark, sf_dir):
    """The shared (doc_id, sh) 3-word-shingle relation. Repartition
    the RAW text, THEN shingle: a projection inside the parallelize
    ran below the exchange, i.e. in the single scan task of a
    one-row-group file (and shuffled the bigger shingle arrays
    instead of the text)."""
    d = t(spark, sf_dir).documents
    return parallelize(d.select("doc_id", "text")).select(
        "doc_id", word_shingles("text", 3).alias("sh")
    )


def strong_pairs(spark, sf_dir, docs=None):
    """Exact unblocked strong-pair set (shingle Jaccard ≥ 0.9) via the
    prefix-filtered similarity join — sub-quadratic, deterministic,
    and value-identical to _STRONG_PAIRS_SQL's nested-loop twin.
    ``docs`` lets a caller that already materialized the shingled
    relation share it (round 15 — the contracts compute shingles once)."""
    from mcp_iceberg_duckdb_spark.functions.simjoin import exact_jaccard_pairs

    if docs is None:
        docs = shingled_docs(spark, sf_dir)
    return exact_jaccard_pairs(docs, 9, 10, out_sim_col=None)


@query(
    "x_dedup_minhash_lsh",
    # TWO-SIDED: DuckDB runs its own minhash+banding+verify pipeline
    # (_LSH_TWIN_SQL) through the identical contract instead of
    # pinning TRUE.
    oracle=f"""
    {_LSH_TWIN_SQL},
    emitted AS (SELECT * FROM verified WHERE jac >= 0.8),
    hit AS (
        SELECT count(*) AS n_hit
        FROM strong SEMI JOIN emitted USING (doc_a, doc_b)
    ),
    prec AS (SELECT min(jac) >= 0.8 AS precision_ok FROM emitted)
    SELECT ns.n AS n_strong_pairs,
           prec.precision_ok,
           (hit.n_hit * 100 >= ns.n * 95) AS recall_ok
    FROM ns, hit, prec
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_minhash_lsh(spark, sf_dir):
    """Near-dup detection via lsh_verified_pairs (≥ 0.8), emitted as
    the DECIDABLE one-row contract (VERDICT round-2 item 4 — the
    a_approx_count_distinct pattern): the LSH candidate set is
    hash-family-specific, so instead of the (unhashable) pairs the
    query emits the exact strong-pair count (value-checked against
    DuckDB's nested-loop twin) plus two booleans the oracle pins TRUE
    — precision (every emitted pair's exact-verified Jaccard ≥ 0.8;
    min over an empty pair set yields NULL and fails the pin, so "no
    pairs found" cannot slip through) and recall ≥ 95% on strong
    (≥ 0.9) pairs — measured 100% at sf 0.001/0.01/0.1. A wrong hash
    family, banding bug, or dropped bucket flips a bit the driver
    hashes. The pair ROWS stay available via lsh_verified_pairs
    (property-tested, benched)."""
    pairs = lsh_verified_pairs(spark, sf_dir)
    strong = strong_pairs(spark, sf_dir)
    n_strong = strong.agg(F.count("*").alias("n_strong_pairs"))
    prec = pairs.agg(
        (F.min("jaccard") >= F.lit(0.8)).alias("precision_ok")
    )
    hits = (
        pairs.join(strong, ["doc_a", "doc_b"], "semi")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        n_strong.crossJoin(prec)
        .crossJoin(hits)
        .select(
            "n_strong_pairs",
            "precision_ok",
            (F.col("n_hit") * 100 >= F.col("n_strong_pairs") * 95).alias(
                "recall_ok"
            ),
        )
    )


def minhash_mllib_pairs(spark, sf_dir, docs=None):
    """The MLlib route to the near-dup pair set: shingles →
    HashingTF (binary) → ml.feature.MinHashLSH.approxSimilarityJoin
    at Jaccard distance ≤ 0.2, i.e. similarity ≥ 0.8 over the hashed
    shingle space. Kept alongside the expression pipeline
    (lsh_verified_pairs) as the library path — same banding idea,
    vectorized columns instead of array expressions. ``docs`` lets the
    contract share one materialized shingle relation (round 15)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # raw text below the exchange, shingles above it (see shingled_docs)
    if docs is None:
        docs = shingled_docs(spark, sf_dir).persist()
    tf = HashingTF(
        inputCol="sh", outputCol="features", binary=True, numFeatures=1 << 18
    )
    feats = tf.transform(docs).filter(
        # MinHashLSH rejects empty vectors
        F.size("sh") > 0
    )
    # numHashTables drives approxSimilarityJoin's explode factor
    # almost linearly — round-10 profile at sf0.1: fit+join 3.7 s at
    # 8 tables vs 1.4 s at 4, with an IDENTICAL 256-pair result
    # (HashingTF+persist is the other ~5 s and is table-independent).
    # 4 single-minhash OR-amplified tables capture a Jaccard>=0.8
    # pair with p = 1-(1-0.8)^4 = 99.84% — far above the contract's
    # 90% strong-pair recall floor, so the library default (the r9
    # verdict's "slowest stable query" flag) was pure overhead here.
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
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


@query(
    "x_dedup_minhash_mllib",
    # TWO-SIDED: same independent DuckDB LSH twin at this contract's
    # looser operating point (precision floor 0.75, recall floor 90%
    # — the MLlib route estimates similarity over the hashed space,
    # so its exact-Jaccard floor sits below the emission threshold).
    oracle=f"""
    {_LSH_TWIN_SQL},
    emitted AS (SELECT * FROM verified WHERE jac >= 0.75),
    hit AS (
        SELECT count(*) AS n_hit
        FROM strong SEMI JOIN emitted USING (doc_a, doc_b)
    ),
    prec AS (SELECT min(jac) >= 0.75 AS precision_ok FROM emitted)
    SELECT ns.n AS n_strong_pairs,
           prec.precision_ok,
           (hit.n_hit * 10 >= ns.n * 9) AS recall_ok
    FROM ns, hit, prec
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_minhash_mllib(spark, sf_dir):
    """Decidable contract over minhash_mllib_pairs (same pattern as
    x_dedup_minhash_lsh): exact strong-pair count, plus precision
    (every emitted pair re-verified against the TRUE shingle sets has
    exact Jaccard ≥ 0.75 — approxSimilarityJoin estimates over the
    hashed space, where HashingTF collisions can inflate the estimate;
    measured min exact Jaccard 0.8 at sf 0.001/0.01/0.1) and recall
    ≥ 90% on strong pairs (measured 100%). The pair rows stay
    available via minhash_mllib_pairs (property-tested)."""
    # ONE materialized shingle relation serves the MLlib pipeline, the
    # exact-Jaccard re-verification of its emitted pairs, AND the
    # strong-pair baseline (round 15, VERDICT r14 item 2): previously
    # the verify sides re-ran scan+shingle twice (an un-parallelized
    # d.select that never matched the persisted plan) and strong_pairs
    # built its own relation.
    docs = shingled_docs(spark, sf_dir).persist()
    verified = (
        minhash_mllib_pairs(spark, sf_dir, docs=docs)
        .join(
            docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha")),
            "doc_a",
        )
        .join(
            docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb")),
            "doc_b",
        )
        .select("doc_a", "doc_b", r6(jaccard("sha", "shb")).alias("jx"))
    )
    strong = strong_pairs(spark, sf_dir, docs=docs)
    n_strong = strong.agg(F.count("*").alias("n_strong_pairs"))
    prec = verified.agg((F.min("jx") >= F.lit(0.75)).alias("precision_ok"))
    hits = verified.join(strong, ["doc_a", "doc_b"], "semi").agg(
        F.count("*").alias("n_hit")
    )
    return (
        n_strong.crossJoin(prec)
        .crossJoin(hits)
        .select(
            "n_strong_pairs",
            "precision_ok",
            (F.col("n_hit") * 10 >= F.col("n_strong_pairs") * 9).alias(
                "recall_ok"
            ),
        )
    )


def simhash_pairs(spark, sf_dir):
    """SimHash near-dup pair rows: 64-bit signature per doc,
    candidates = 16-bit band collision, verified at hamming distance
    ≤ 6. Pure expression pipeline (fold over tokens), one shuffle on
    the band key."""
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
    "x_dedup_simhash",
    # TWO-SIDED (round-8): instead of pinning identical_covered TRUE,
    # DuckDB builds its OWN 64-bit SimHash (xxhash64 token bits,
    # majority vote per bit), bands it 4x16, and checks that every
    # identical-content pair collides at hamming 0 in its own banded
    # candidate set — a contract that is structurally unachievable
    # (e.g. banding that can drop identical pairs) now fails on both
    # engines, not only where Spark can falsify it.
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(string_split(text, ' '))) AS tk
        FROM documents
    ),
    votes AS (
        SELECT doc_id, b.b AS b,
               CASE WHEN sum(CASE WHEN (hash(tk) >> b.b) & 1 = 1
                                  THEN 1 ELSE -1 END) > 0
                    THEN 1::HUGEINT ELSE 0::HUGEINT END AS bit
        FROM toks, (SELECT unnest(range(64)) AS b) b
        GROUP BY doc_id, b.b
    ),
    sig AS (
        SELECT doc_id, sum(bit * (1::HUGEINT << CAST(b AS INT))) AS sh
        FROM votes GROUP BY doc_id
    ),
    h AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS csig
        FROM documents
    ),
    ident AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM h a JOIN h b ON a.csig = b.csig AND a.doc_id < b.doc_id
    ),
    bands AS (
        SELECT doc_id, sh, b.b AS band,
               CAST((sh >> (16 * CAST(b.b AS INT))) & 65535 AS BIGINT) AS bval
        FROM sig, (SELECT unnest(range(4)) AS b) b
    ),
    cand0 AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
        WHERE a.sh = b.sh
    ),
    found AS (
        SELECT count(*) AS n_found
        FROM ident SEMI JOIN cand0 USING (doc_a, doc_b)
    ),
    ni AS (SELECT count(*) AS n_ident FROM ident)
    SELECT (SELECT count(*) FROM documents) AS n_docs,
           CAST(ni.n_ident AS BIGINT) AS n_identical_pairs,
           (found.n_found = ni.n_ident) AS identical_covered
    FROM ni, found
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_simhash(spark, sf_dir):
    """Decidable contract over simhash_pairs. A SimHash's hamming
    distances are hash-family-specific, but one property is exact and
    oracle-computable: two docs with the SAME normalized token set
    (the x_dedup_exact content signature) MUST simhash identically —
    every vote is over the same tokens — so they collide in every
    band and surface at hamming 0. The contract emits the corpus
    size and the exact identical-pair count (both value-checked: the
    oracle sums k·(k−1)/2 over content-signature groups) plus a
    boolean pinned TRUE that ALL those pairs appear in simhash_pairs'
    output at hamming 0 — a dropped band, a non-commutative fold, or
    a tokenization drift flips it. (Recall on merely-similar pairs is
    NOT pinned: measured ~0.27-0.30 at hamming ≤ 6 on ≥0.9-Jaccard
    token sets — 64-bit SimHash is noisy on short docs; the pair rows
    for such analysis stay available via simhash_pairs.)"""
    d = t(spark, sf_dir).documents
    sig = F.md5(F.array_join(F.array_sort(distinct_tokens("text")), " "))
    docs = d.select("doc_id", sig.alias("sig"))
    a, b = docs.alias("a"), docs.alias("b")
    ident = (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    n_docs = d.agg(F.count("*").alias("n_docs"))
    n_ident = ident.agg(F.count("*").cast("bigint").alias("n_identical_pairs"))
    found = (
        simhash_pairs(spark, sf_dir)
        .filter(F.col("hamming") == 0)
        .join(ident, ["doc_a", "doc_b"], "semi")
        .agg(F.count("*").alias("n_found"))
    )
    return (
        n_docs.crossJoin(n_ident)
        .crossJoin(found)
        .select(
            "n_docs",
            "n_identical_pairs",
            (F.col("n_found") == F.col("n_identical_pairs")).alias(
                "identical_covered"
            ),
        )
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
    """Exact n-gram (3-word shingle) Jaccard similarity join within
    `source` blocks — the deterministic, oracle-checkable dedup path.
    Since round 3 the plan is the prefix-filtered AllPairs join
    (functions/simjoin.py): identical output to the nested-loop twin
    the DuckDB oracle still runs, but candidates come from shared
    rare-prefix tokens, so NO registered plan carries an all-pairs
    join (VERDICT round-2 item 6) — measured 17× faster at sf0.1
    (48.6 s block-quadratic → 2.8 s) and linear-with-corpus at the
    100 TB design point."""
    from mcp_iceberg_duckdb_spark.functions.simjoin import exact_jaccard_pairs

    d = t(spark, sf_dir).documents
    docs = parallelize(d.select("doc_id", "source", "text")).select(
        "doc_id", "source", word_shingles("text", 3).alias("sh")
    )
    return exact_jaccard_pairs(
        docs, 1, 2, block_cols=("source",), out_sim_col="jaccard"
    )


@query(
    "x_dedup_containment",
    oracle="""
    WITH base AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + 10000000 AS doc_id, source,
               array_to_string(
                   string_split(text, ' ')[1:greatest(
                       CAST(floor((len(string_split(text, ' ')) + 1) / 2) AS INT), 4)],
                   ' ') AS text
        FROM documents WHERE doc_id % 7 = 0
    ),
    d AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(greatest(len(string_split(text, ' ')) - 2, 1)),
                   i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], ' ')
               )) AS sh
        FROM base
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(a.sh)) * 1e6 + 0.5) / 1e6 AS containment
    FROM d a JOIN d b ON a.source = b.source AND a.doc_id <> b.doc_id
                     AND len(a.sh) >= 30
    WHERE floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / len(a.sh)) * 1e6 + 0.5) / 1e6 >= 0.8
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_containment(spark, sf_dir):
    """Asymmetric shingle CONTAINMENT join — C(A→B) = |A∩B| / |A| ≥
    0.8, ordered pairs within `source` blocks, contained side gated
    at ≥ 30 shingles (~32 words — the Gopher-style minimum-length
    filter production pipelines apply before dedup; a tiny doc is
    trivially "contained" everywhere, which is noise). Jaccard-based
    dedup misses the contained-document relation (a short post quoted
    whole inside a long page has J ≈ |A|/|B| → 0 but C(A→B) = 1);
    crawl pipelines dedup those with Broder-style containment. The
    corpus has almost no organic containments, so the fixture is
    planted IN-QUERY, identically in both engines: every 7th document
    contributes a first-half excerpt (doc_id + 10⁷) whose shingle set
    is a strict subset of its parent's — guaranteed C = 1 toward the
    parent (for parents long enough to clear the gate), while the
    parent-toward-excerpt direction scores ≈ 0.5 and is correctly
    absent, pinning the asymmetry.

    Plan (functions/simjoin.exact_containment_pairs): the SSJoin
    containment prefix filter, K-extended — A's rarest-token prefix
    (|A|−α+4 tokens) joins B's FULL position-annotated token list
    under one global (df, tok) order; candidates must score ≥ 4
    prefix hits (pigeonhole-lossless) and pass the jmin positional
    bound, then exact verification counts |A∩B| on the NARROW
    (doc, token) relation — measured at 550k docs: the plain K=1
    prefix + array-join verify spilled /tmp dry on 161M candidates;
    this shape verifies ~10⁴. Reference parity: reference has no
    dedup surface (it delegates SELECTs to DuckDB,
    IcebergConnection.py:114-116); this extends §2.11's dedup
    family."""
    from mcp_iceberg_duckdb_spark.functions.simjoin import (
        exact_containment_pairs,
    )

    d = t(spark, sf_dir).documents
    words = F.split(F.col("text"), " ")
    k = F.greatest(
        F.floor((F.size(words) + F.lit(1)) / F.lit(2)).cast("int"), F.lit(4)
    )
    ex = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(10000000)).alias("doc_id"),
        "source",
        F.array_join(F.slice(words, F.lit(1), k), " ").alias("text"),
    )
    base = d.select("doc_id", "source", "text").unionByName(ex)
    docs = parallelize(base.select("doc_id", "source", "text")).select(
        "doc_id", "source", word_shingles("text", 3).alias("sh")
    )
    return exact_containment_pairs(
        docs, 4, 5, block_cols=("source",), min_len=30
    )


@query(
    "x_dedup_embedding_cosine",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    flat AS (
        SELECT e.label, g.i, e.v[g.i] AS x
        FROM e, LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS i) g
    ),
    comp AS (
        SELECT label, i, avg(x) AS cx FROM flat GROUP BY label, i
    ),
    cent AS (
        SELECT label AS clabel, list(cx ORDER BY i) AS cv FROM comp GROUP BY label
    ),
    scored AS (
        SELECT e.vec_id, e.v, c.clabel,
               list_cosine_similarity(e.v, c.cv) AS sim
        FROM e CROSS JOIN cent c
    ),
    assigned AS (
        SELECT vec_id, v, clabel AS cluster_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY CAST(floor(sim * 1e6 + 0.5) AS BIGINT) DESC, clabel) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           floor((list_cosine_similarity(a.v, b.v)) * 1e6 + 0.5) / 1e6 AS cos_sim
    FROM assigned a JOIN assigned b
      ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
    WHERE floor((list_cosine_similarity(a.v, b.v)) * 1e6 + 0.5) / 1e6 >= 0.35
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pair listing, blocked on a BOUNDED
    centroid assignment (the SemDeDup primitive,
    pipeline_extra.label_centroid_assignment) instead of the raw
    `label` column: cosine in float64 via zip_with/aggregate (no
    UDF), pairs only within an assigned cluster.

    Round-4 re-key: `label` has a handful of data-determined distinct
    values, so label blocks grow with the corpus and the pair join was
    the suite's last O(block²) plan. The centroid assignment keys the
    identical join on a cluster id whose cardinality k is an operator
    knob — at 100 TB you raise k (the SemDeDup paper runs k≈11k for
    600 M docs) and Σ(cluster_size²) stays bounded regardless of how
    `label` skews. The unblocked scale path for top-k neighbors stays
    x_ann_lsh_topk's hyperplane bucketing."""
    from mcp_iceberg_duckdb_spark.operators.pipeline_extra import (
        label_centroid_assignment,
    )

    e = parallelize(
        t(spark, sf_dir).embeddings.select(
            "vec_id", "label", as_double("embedding").alias("v")
        )
    )
    assigned = label_centroid_assignment(e)
    a, b = assigned.alias("a"), assigned.alias("b")
    pair_cos = vdot(F.col("a.v"), F.col("b.v")) / F.nullif(
        F.col("a.nrm") * F.col("b.nrm"), F.lit(0.0)
    )
    return (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            r6(pair_cos).alias("cos_sim"),
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
    """Near-dup CLUSTERING, deterministic twin: connected components
    (connected_components min-label loop) over the exact
    n-gram-Jaccard pair graph (same edges as x_dedup_ngram_jaccard,
    generated by the same prefix-filtered exact join — no all-pairs
    plan since round 3). Pairs alone under-delete (A~B, B~C but A≁C
    leaves a duplicate); the transitive closure is what a corpus
    pipeline actually deduplicates by. cluster_id = min doc_id in the
    component, so one keeper per cluster falls out for free. The
    unblocked production path is x_dedup_cluster_cc_lsh (CC over LSH
    candidate pairs)."""
    from mcp_iceberg_duckdb_spark.functions.simjoin import exact_jaccard_pairs

    d = t(spark, sf_dir).documents
    docs = parallelize(d.select("doc_id", "source", "text")).select(
        "doc_id", "source", word_shingles("text", 3).alias("sh")
    )
    pairs = exact_jaccard_pairs(
        docs, 1, 2, block_cols=("source",), out_sim_col=None
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    return connected_components(pairs).toDF("doc_id", "cluster_id")


@query(
    "x_dedup_cluster_cc_stars",
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
def x_dedup_cluster_cc_stars(spark, sf_dir):
    """x_dedup_cluster_cc's exact twin computed by the ALTERNATING
    LARGE-STAR/SMALL-STAR algorithm (star_components) instead of the
    min-label loop — identical pair graph, identical oracle,
    identical (doc_id, cluster_id) output, different iteration
    theory: O(log n) rounds on any topology vs diameter rounds.
    Registering both keeps the two web-scale CC strategies
    differentially checked against the same transitive-closure
    oracle AND against each other (tests/test_tierx.py)."""
    from mcp_iceberg_duckdb_spark.functions.simjoin import exact_jaccard_pairs

    d = t(spark, sf_dir).documents
    docs = parallelize(d.select("doc_id", "source", "text")).select(
        "doc_id", "source", word_shingles("text", 3).alias("sh")
    )
    pairs = exact_jaccard_pairs(
        docs, 1, 2, block_cols=("source",), out_sim_col=None
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    return star_components(pairs).toDF("doc_id", "cluster_id")


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
    state) cannot — for web-scale/high-diameter graphs use
    star_components below (the implemented large-star/small-star
    variant, O(log n) rounds on any topology)."""
    # persist BEFORE the symmetrize-union: both union branches read
    # pairs, so an unpersisted input runs the (expensive) pair
    # generation twice — at scale that doubles the LSH verify join
    pairs = pairs.persist()
    # cache the symmetric edges ALREADY hash-partitioned on the
    # per-round join key (round 15, guide §2.4): InMemoryRelation
    # preserves the cached plan's partitioning, so every round's
    # edges⋈labels join reads the cache without re-exchanging the
    # |E|-row side — one up-front exchange into the cache instead of
    # one per round.
    edges = (
        pairs.union(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition("dst")
        .persist()
    )
    from pyspark.sql import Observation

    # seed labels with min(node, min neighbor) — identical to
    # "labels = node" followed by one propagation round, but one
    # checkpoint+sum cheaper; near-dup cliques converge right here
    # and the loop only runs its single confirming round.
    # The convergence sum rides the checkpoint job as an observed
    # metric (round 15): eager localCheckpoint() runs through
    # withAction, so the CollectMetrics accumulator is populated by
    # the SAME job that materializes the labels — one job per round
    # instead of checkpoint + separate sum action (the VERDICT r14
    # item-1 fusion; the eager=False variant recomputes and was
    # measured 2.5× slower in r14, so the fusion keeps eager=True).
    obs = Observation()
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nmin"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("nmin")).alias("label"),
        )
        .observe(obs, F.sum("label").alias("s"))
        .localCheckpoint()
    )
    prev_sum = obs.get["s"]
    # loop TO THE FIXPOINT (sum of labels is a strictly decreasing
    # int64 until convergence, so termination is guaranteed); a fixed
    # round cap silently returns wrong labels on any graph whose
    # diameter exceeds it — caught by the hard-topology property test
    # (a 60-node path under a 20-round cap). The cap is now a safety
    # escape that RAISES instead of mislabeling; near-dup components
    # still converge in 2-3 rounds, and for genuinely high-diameter
    # graphs star_components (O(log n) rounds) is the right operator.
    for rounds in range(10_000):
        nmin = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        obs = Observation()
        labels = (
            labels.join(nmin, labels.node == nmin.src, "left")
            .select(
                F.col("node"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            # sum observed during the checkpoint job (see seed above)
            .observe(obs, F.sum("label").alias("s"))
            .localCheckpoint()  # truncate lineage; prod: checkpoint()
        )
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            "connected_components did not converge in 10000 rounds"
        )
    edges.unpersist()
    pairs.unpersist()
    return labels.select("node", "label")


def star_components(pairs, max_rounds: int = 30):
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris-Lattanzi-Mirrokni-Rastogi-Vassilvitskii, SoCC'14 — the
    published web-scale CC algorithm). Same contract as
    connected_components: (src < dst) pair rows in, (node, label)
    out with label = component min.

    Why it exists beside the min-label loop: min-label converges in
    DIAMETER rounds — fine for near-dup cliques (2-3), fatal for a
    long-path web graph. Large/small-star halves component height
    per round (O(log n) rounds on ANY topology) and every round's
    edge set only shrinks toward the star forest, whereas min-label
    keeps the full edge relation forever. The price is two
    groupBy+join passes per round instead of one.

    Round = large-star (every node hangs its LARGER neighbors onto
    its min neighbor-or-self) then small-star (every node hangs its
    smaller-or-equal neighborhood onto its min). Edges stay
    canonical (big, small); each pass is one per-node min groupBy
    broadcast-joined back — map-side combinable, no driver state but
    the fixed-point counter.

    Fixed point: the edge set is a star forest with min centers ⇔ no
    node appears both as a leaf (big side) and a center (small
    side) — an exact, 1-int64 check (semi-join count), no hashing
    heuristics. Labels then read directly off the stars."""
    edges = (
        pairs.select(
            F.greatest("src", "dst").alias("big"),
            F.least("src", "dst").alias("small"),
        )
        .where(F.col("big") != F.col("small"))
        .distinct()
        .persist()
    )
    # only the INITIAL edge relation needs a persist (it shields the
    # expensive pair generation from round 1's four references); from
    # round 1 on, `edges` is an eager localCheckpoint — already
    # materialized — and the former per-round ss.persist() layered an
    # InMemoryRelation copy on top of the checkpoint blocks (round 15:
    # double-caching removed, one materialization per round)
    initial = edges
    for _ in range(max_rounds):
        sym = edges.select(
            F.col("big").alias("u"), F.col("small").alias("v")
        ).unionByName(
            edges.select(
                F.col("small").alias("u"), F.col("big").alias("v")
            )
        )
        # large-star: m(u) = min(N(u) ∪ {u}); emit (v, m) for v > u
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("big"), F.col("m").alias("small"))
            .where(F.col("big") != F.col("small"))
        )
        # small-star over the large-star output: m(u) = min(N⁻(u) ∪
        # {u}); emit (v, m) for v ∈ N⁻(u) ∪ {u}, v ≠ m. On canonical
        # (big, small) rows, N⁻(u) IS the small side grouped by big.
        smins = ls.groupBy("big").agg(F.min("small").alias("m"))
        ss = (
            ls.join(smins, "big")
            .select(F.col("small").alias("big"), F.col("m").alias("small"))
            .unionByName(
                smins.select(
                    F.col("big"), F.col("m").alias("small")
                )
            )
            .where(F.col("big") != F.col("small"))
            .distinct()
            .localCheckpoint()  # truncate per-round lineage
        )
        edges = ss
        if initial is not None:
            initial.unpersist()
            initial = None
        # star-forest fixed point: leaves (big) and centers (small)
        # are disjoint node sets — a cheap semi-join count over the
        # checkpointed blocks
        chained = (
            edges.select(F.col("small").alias("n"))
            .join(edges.select(F.col("big").alias("n")), "n", "leftsemi")
            .count()
        )
        if chained == 0:
            break
    else:
        # mirror connected_components: NEVER return silently-wrong
        # labels past the round budget (O(log² n) rounds suffice per
        # the paper — 30 covers any feasible graph; hitting this
        # means a bug, not a big input)
        raise RuntimeError(
            f"star_components did not converge in {max_rounds} rounds"
        )
    # plain view over the (already checkpointed) star forest — the
    # former extra localCheckpoint existed only so the per-round cache
    # entry could be unpersisted before returning; with the
    # double-caching gone there is no cache entry to release and the
    # distinct runs once in the caller's single action
    labels = edges.select(
        F.col("big").alias("node"), F.col("small").alias("label")
    ).unionByName(
        edges.select(
            F.col("small").alias("node"), F.col("small").alias("label")
        )
    ).distinct()
    if initial is not None:
        initial.unpersist()
    return labels


def cluster_cc_lsh(spark, sf_dir):
    """Near-dup clustering at the 100 TB scale: connected components
    over the MinHash-LSH candidate pairs (lsh_verified_pairs,
    exact-Jaccard-verified ≥ 0.8) — edge generation is sub-quadratic
    (bucket-local, never all-pairs). Returns (doc_id, cluster_id)."""
    pairs = lsh_verified_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return connected_components(pairs).toDF("doc_id", "cluster_id")


@query(
    "x_dedup_cluster_cc_lsh",
    # TWO-SIDED: DuckDB clusters its OWN LSH-verified pairs with a
    # recursive-CTE transitive closure and checks the co-clustering
    # floor on its own components instead of pinning TRUE.
    oracle=f"""
    {_LSH_TWIN_SQL},
    emitted AS (SELECT * FROM verified WHERE jac >= 0.8),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM emitted
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM emitted
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    labels AS (
        SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    ),
    co AS (
        SELECT count(*) AS n_co
        FROM strong s
        JOIN labels la ON la.doc_id = s.doc_a
        JOIN labels lb ON lb.doc_id = s.doc_b
        WHERE la.cluster_id = lb.cluster_id
    )
    SELECT ns.n AS n_strong_pairs,
           (co.n_co * 100 >= ns.n * 95) AS strong_coclustered_ok
    FROM ns, co
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_cluster_cc_lsh(spark, sf_dir):
    """Decidable contract over cluster_cc_lsh (VERDICT round-2 item
    4): the LSH-fed component labels are hash-family-specific, so the
    query emits the exact strong-pair count (value-checked) plus a
    boolean the oracle pins TRUE: ≥ 95% of strong (exact Jaccard
    ≥ 0.9) pairs land in the SAME component — measured 100% at sf
    0.001/0.01/0.1. A broken label loop, missed bucket, or premature
    convergence strands a strong pair across two clusters and flips
    the bit. A strong pair whose nodes never entered the edge graph
    counts as NOT co-clustered (left join; NULL labels fail the
    equality). Cluster rows stay available via cluster_cc_lsh
    (property-tested, benched)."""
    labels = cluster_cc_lsh(spark, sf_dir)
    strong = strong_pairs(spark, sf_dir)
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb")
    )
    co = (
        strong.join(la, "doc_a", "left")
        .join(lb, "doc_b", "left")
        .agg(
            F.count("*").alias("n_strong_pairs"),
            F.coalesce(
                F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)),
                F.lit(0),
            ).alias("n_co"),
        )
    )
    return co.select(
        "n_strong_pairs",
        (
            F.col("n_co") * 100 >= F.col("n_strong_pairs") * 95
        ).alias("strong_coclustered_ok"),
    )


@query(
    "x_dedup_incremental",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(greatest(len(string_split(text, ' ')) - 2, 1)),
                   i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], ' ')
               )) AS sh
        FROM documents
    ),
    new AS (SELECT * FROM d WHERE doc_id % 10 = 0),
    old AS (SELECT * FROM d WHERE doc_id % 10 <> 0),
    pairs AS (
        SELECT n.doc_id AS nid, count(*) AS n_dup
        FROM new n JOIN old o ON n.source = o.source
        WHERE floor((CAST(len(list_intersect(n.sh, o.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(n.sh, o.sh))))
                    * 1e6 + 0.5) / 1e6 >= 0.5
        GROUP BY n.doc_id
    )
    SELECT n.doc_id, coalesce(p.n_dup, 0) AS n_dup_partners,
           coalesce(p.n_dup, 0) > 0 AS is_incremental_dup
    FROM new n LEFT JOIN pairs p ON n.doc_id = p.nid
    """,
    tags=("dedup", "tierx"),
)
def x_dedup_incremental(spark, sf_dir):
    """INCREMENTAL dedup — the daily-append production shape: a new
    batch (simulated as doc_id % 10 == 0) is checked for near-dups
    against the EXISTING corpus only, never re-pairing the corpus
    with itself. At 100 TB this is the difference between O(batch ×
    corpus-candidates) per day and re-running the full corpus-squared
    dedup; the same asymmetric join is how eval-set decontamination
    runs against a frozen benchmark side.

    Plan: the cross-collection prefix-filtered AllPairs join
    (functions/simjoin.exact_jaccard_join — one global (df, token)
    order over the union, candidates only from shared rare-prefix
    tokens) verified with exact Jaccard ≥ 0.5 inside source blocks;
    per-new-doc partner counts left-join back so clean docs emit
    n_dup_partners = 0. Output is identical to the nested-loop
    new×old twin the oracle runs."""
    from mcp_iceberg_duckdb_spark.functions.simjoin import exact_jaccard_join

    d = t(spark, sf_dir).documents
    shingled = (
        parallelize(d.select("doc_id", "source", "text"))
        .select("doc_id", "source", word_shingles("text", 3).alias("sh"))
        .persist()
    )
    new = shingled.filter(F.col("doc_id") % 10 == 0)
    old = shingled.filter(F.col("doc_id") % 10 != 0)
    pairs = exact_jaccard_join(
        new, old, 1, 2, block_cols=("source",), out_sim_col=None
    )
    agg = pairs.groupBy(F.col("left_id").alias("doc_id")).agg(
        F.count("*").alias("n_dup")
    )
    return new.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_dup"), F.lit(0).cast("bigint")).alias(
            "n_dup_partners"
        ),
        (F.coalesce(F.col("n_dup"), F.lit(0).cast("bigint")) > 0).alias(
            "is_incremental_dup"
        ),
    )


# ---- edit-distance near-dup (prefix-blocked levenshtein join) ----

_LEV_PREFIX = 16  # blocking key length (chars)
_LEV_CMP = 64  # comparison field length (bounds per-pair DP cost)
_LEV_MAXDIST = 8
_LEV_LENBAND = 8

_LEV_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, n_chars, lower(trim(text)) AS nt FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(substr(a.nt, 1, {_LEV_CMP}),
                            substr(b.nt, 1, {_LEV_CMP})) AS BIGINT) AS dist
    FROM d a JOIN d b
      ON substr(a.nt, 1, {_LEV_PREFIX}) = substr(b.nt, 1, {_LEV_PREFIX})
     AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= {_LEV_LENBAND}
    WHERE levenshtein(substr(a.nt, 1, {_LEV_CMP}),
                      substr(b.nt, 1, {_LEV_CMP})) <= {_LEV_MAXDIST}
"""


@query("x_dedup_levenshtein", oracle=_LEV_ORACLE, tags=("dedup", "tierx"))
def x_dedup_levenshtein(spark, sf_dir):
    """Edit-distance near-dup pairs — the typo/OCR-level duplicate
    class that token-set methods (MinHash/Jaccard) can miss and
    character-level methods catch. Classic record-linkage design:

    - BLOCK on the first 16 normalized chars — an equi-key, so
      the candidate join is an ordinary hash join; candidates per
      block are bounded by block size, never all-pairs. (Standard
      prefix-blocking recall caveat: an edit inside the blocking
      prefix escapes the block — production runs add a second pass
      keyed on a different field, same plan shape.)
    - LENGTH-BAND filter |len_a − len_b| ≤ 8: edit distance is
      ≥ the length difference, so the band is lossless for the
      distance threshold and prunes before the DP runs.
    - VERIFY with levenshtein on a 64-char comparison field —
      bounded O(64²) DP per pair (JVM codegen'd, both engines'
      standard dynamic program), never the full document.

    Scale: one shuffle on the block key; Σ(block²) is controlled by
    prefix selectivity (16 chars ≈ collision-free for non-dups), and
    every verified pair costs constant work. Output is the verified
    pair relation (id_a < id_b, dist) that CC clustering
    (x_dedup_cluster_cc) consumes unchanged."""
    d = t(spark, sf_dir).documents.select(
        "doc_id", "n_chars", F.lower(F.trim("text")).alias("nt")
    )
    sides = d.select(
        "doc_id",
        "n_chars",
        F.substring("nt", 1, _LEV_PREFIX).alias("blk"),
        F.substring("nt", 1, _LEV_CMP).alias("cmp"),
    )
    a = sides.select(
        F.col("doc_id").alias("id_a"),
        F.col("n_chars").alias("len_a"),
        "blk",
        F.col("cmp").alias("cmp_a"),
    )
    b = sides.select(
        F.col("doc_id").alias("id_b"),
        F.col("n_chars").alias("len_b"),
        "blk",
        F.col("cmp").alias("cmp_b"),
    )
    return (
        a.join(b, "blk")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(F.col("len_a") - F.col("len_b"))
                <= F.lit(_LEV_LENBAND)
            )
        )
        .withColumn(
            "dist",
            F.levenshtein(F.col("cmp_a"), F.col("cmp_b")).cast("bigint"),
        )
        .where(F.col("dist") <= _LEV_MAXDIST)
        .select("id_a", "id_b", "dist")
    )


# ---- dedup cluster report (size histogram) ----

_CR_ORACLE = """
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
    ),
    clusters AS (
        SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    ),
    sizes AS (
        SELECT cluster_id, count(*) AS cluster_size
        FROM clusters GROUP BY cluster_id
    ),
    hist AS (
        SELECT cluster_size, count(*) AS n_clusters FROM sizes
        GROUP BY cluster_size
    )
    SELECT cluster_size, n_clusters,
           cluster_size * n_clusters AS n_docs,
           (cluster_size - 1) * n_clusters AS n_removable
    FROM hist
    UNION ALL
    SELECT 1, (SELECT count(*) FROM documents)
              - (SELECT count(*) FROM clusters),
           (SELECT count(*) FROM documents)
              - (SELECT count(*) FROM clusters),
           0
"""


@query("x_dedup_cluster_report", oracle=_CR_ORACLE, tags=("dedup", "tierx"))
def x_dedup_cluster_report(spark, sf_dir):
    """The dedup REPORT every corpus pipeline publishes: the
    component-size histogram of the near-dup cluster graph —
    how many clusters of each size, how many docs they hold, and the
    headline number n_removable = Σ (size−1)·count (docs deleted at
    one-keeper-per-cluster), plus the singleton row for unclustered
    docs. Reuses the exact CC pipeline (same prefix-filtered pair
    join + min-label loop as x_dedup_cluster_cc) and adds two tiny
    groupBys over the |clustered-docs| relation — report cost is
    negligible next to the clustering it summarizes.

    Determinism: pure int64 counts; the oracle extends the recursive-
    CTE CC twin with the same histogram."""
    from mcp_iceberg_duckdb_spark.functions.simjoin import exact_jaccard_pairs

    d = t(spark, sf_dir).documents
    docs = parallelize(d.select("doc_id", "source", "text")).select(
        "doc_id", "source", word_shingles("text", 3).alias("sh")
    )
    pairs = exact_jaccard_pairs(
        docs, 1, 2, block_cols=("source",), out_sim_col=None
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    clusters = connected_components(pairs).toDF("doc_id", "cluster_id")
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters")
    ).select(
        "cluster_size",
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias(
            "n_removable"
        ),
    )
    total = d.agg(F.count("*").alias("n_total"))
    in_clusters = clusters.agg(F.count("*").alias("n_clustered"))
    singleton = (
        total.crossJoin(F.broadcast(in_clusters))
        .select(
            F.lit(1).cast("bigint").alias("cluster_size"),
            (F.col("n_total") - F.col("n_clustered")).alias("n_clusters"),
            (F.col("n_total") - F.col("n_clustered")).alias("n_docs"),
            F.lit(0).cast("bigint").alias("n_removable"),
        )
    )
    return hist.unionByName(singleton)


@query(
    "x_corpus_leakage_safe_split",
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
    ),
    cc AS (
        SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    ),
    assign AS (
        SELECT doc.doc_id,
               COALESCE(cc.cluster_id, doc.doc_id) AS cluster_id
        FROM documents doc LEFT JOIN cc ON cc.doc_id = doc.doc_id
    )
    SELECT doc_id, cluster_id,
           CASE WHEN substr(md5('ccsplit:' || CAST(cluster_id AS VARCHAR)), 1, 4)
                     < 'e666' THEN 'train'
                WHEN substr(md5('ccsplit:' || CAST(cluster_id AS VARCHAR)), 1, 4)
                     < 'f333' THEN 'val'
                ELSE 'test' END AS split
    FROM assign
    """,
    tags=("dedup", "pipeline", "tierx"),
)
def x_corpus_leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test split: assign splits by NEAR-DUP
    CLUSTER, never by document. Per-doc hash splits
    (x_corpus_split_hash) leak — two near-duplicates can land one in
    train and one in test, silently inflating eval (the GPT-3 paper's
    Appendix-C contamination bug was exactly this class). Here the
    split key is the connected-component id of the exact
    shingle-Jaccard ≥ 0.5 pair graph (the x_dedup_cluster_cc
    clustering; singletons are their own cluster), so every document
    that shares a near-dup relation — transitively — moves as one
    unit: cross-split near-dup pairs are ZERO by construction
    (tests/test_tierx.py measures the per-doc rule leaking on the
    same corpus while this rule does not).

    Plan: the prefix-filtered exact pair join (no all-pairs), the
    checkpointed min-label CC loop, one left join back to the corpus,
    then the split is a pure md5 expression of cluster_id — identical
    determinism story to x_corpus_split_hash (membership is a pure
    function of content relations, stable under reruns, appends, and
    engine moves). At 100 TB the CC is the LSH-candidate variant
    (x_dedup_cluster_cc_lsh) with the same downstream split
    expression."""
    from mcp_iceberg_duckdb_spark.functions.simjoin import exact_jaccard_pairs

    d = t(spark, sf_dir).documents
    docs = parallelize(d.select("doc_id", "source", "text")).select(
        "doc_id", "source", word_shingles("text", 3).alias("sh")
    )
    pairs = exact_jaccard_pairs(
        docs, 1, 2, block_cols=("source",), out_sim_col=None
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    return cluster_split_assign(d, pairs)


def cluster_split_assign(d, pairs):
    """Downstream of the leakage-safe split, factored out so the pair
    SOURCE is pluggable: the registered op feeds it the exact
    prefix-filtered pairs (full oracle parity at fixture scale); the
    production/decade path feeds it lsh_verified_pairs(threshold=0.5,
    n_bands=16, rows=2) — measured: the exact t=1/2 prefix join's
    candidate mass grows superlinearly on a fixed-vocabulary corpus
    (533M candidates, shuffle-spilled /tmp dry at 500k docs) while the
    LSH-fed variant stays near the x_dedup_cluster_cc_lsh envelope.
    Same CC, same md5 split expression, identical output whenever the
    pair sources agree (planted near-dups sit far above either
    operating point)."""
    cc = connected_components(pairs).toDF("doc_id", "cluster_id")
    assign = (
        d.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )
    h = F.substring(
        F.md5(F.concat(F.lit("ccsplit:"), F.col("cluster_id").cast("string"))),
        1,
        4,
    )
    return assign.select(
        "doc_id",
        "cluster_id",
        F.when(h < "e666", "train")
        .when(h < "f333", "val")
        .otherwise("test")
        .alias("split"),
    )


# ---- capstone 2: training-data release manifest ----

_REL_K = 16  # shards per split


@query(
    "x_pipeline_release_manifest",
    oracle=f"""
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
    ),
    cc AS (
        SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    ),
    assign AS (
        SELECT doc.doc_id,
               len(string_split(doc.text, ' ')) AS n_tokens,
               CASE WHEN substr(md5('ccsplit:' || CAST(
                        COALESCE(cc.cluster_id, doc.doc_id) AS VARCHAR)), 1, 4)
                         < 'e666' THEN 'train'
                    WHEN substr(md5('ccsplit:' || CAST(
                        COALESCE(cc.cluster_id, doc.doc_id) AS VARCHAR)), 1, 4)
                         < 'f333' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents doc LEFT JOIN cc ON cc.doc_id = doc.doc_id
    ),
    ranked AS (
        SELECT split, n_tokens,
               row_number() OVER (PARTITION BY split
                                  ORDER BY n_tokens DESC, doc_id) - 1 AS pos
        FROM assign
    ),
    sharded AS (
        SELECT split, n_tokens,
               CASE WHEN (pos // {_REL_K}) % 2 = 0
                    THEN pos % {_REL_K}
                    ELSE {_REL_K - 1} - (pos % {_REL_K}) END AS shard
        FROM ranked
    )
    SELECT split, CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS token_load
    FROM sharded GROUP BY split, shard
    """,
    tags=("pipeline", "tierx"),
)
def x_pipeline_release_manifest(spark, sf_dir):
    """Capstone 2 — the training-data RELEASE manifest, the artifact a
    data team actually hands to a training run: leakage-safe
    cluster split (near-dups move as one unit) composed with per-split
    balanced shard packing (zigzag LPT-lite, K=16 per split), emitting
    per (split, shard) document and token loads. Composes the
    separately-oracled x_corpus_leakage_safe_split and
    x_pack_balanced_shards stages end-to-end — the proof the operators
    CHAIN into one lazy plan (the x_pipeline_corpus_curation
    precedent).

    Spark shape: the split assignment reuses cluster_split_assign
    (prefix-filtered exact pairs at fixture scale, LSH-fed at 100 TB);
    the within-split rank is ONE window per split partition (3
    partitions — at 100 TB swap in the two-phase count-offset rank of
    x_pack_balanced_shards, same output by construction, pinned by
    that op's oracle); the manifest is one (split, shard) groupBy."""
    from pyspark.sql import Window as W

    from mcp_iceberg_duckdb_spark.functions.simjoin import exact_jaccard_pairs
    from mcp_iceberg_duckdb_spark.functions.textfns import tokens as _toks

    d = t(spark, sf_dir).documents
    docs = parallelize(d.select("doc_id", "source", "text")).select(
        "doc_id", "source", word_shingles("text", 3).alias("sh")
    )
    pairs = exact_jaccard_pairs(
        docs, 1, 2, block_cols=("source",), out_sim_col=None
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    split = cluster_split_assign(d, pairs).select("doc_id", "split")
    toks = d.select(
        "doc_id", F.size(_toks("text")).cast("bigint").alias("n_tokens")
    )
    assign = toks.join(split, "doc_id")
    w = W.partitionBy("split").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    k = F.lit(_REL_K)
    sharded = assign.withColumn(
        "pos", F.row_number().over(w) - 1
    ).withColumn(
        "shard",
        F.when(
            (F.col("pos") / k).cast("bigint") % 2 == 0, F.col("pos") % k
        ).otherwise(F.lit(_REL_K - 1) - (F.col("pos") % k)),
    )
    return sharded.groupBy(
        "split", F.col("shard").cast("bigint").alias("shard")
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("token_load"),
    )
