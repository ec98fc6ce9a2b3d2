"""Exact set-similarity join via prefix filtering — the sub-quadratic
way to compute ALL pairs with Jaccard ≥ t, with no approximation.

This is the AllPairs / PPJoin candidate condition (Bayardo et al.,
WWW'07; Xiao et al., WWW'08), a published exact technique: order every
document's tokens by a global total order (ascending document
frequency, ties by token value), take each document's *prefix* of
length |x| − ⌈t·|x|⌉ + 1, and generate a candidate pair only when two
documents share a prefix token. The theorem: any pair with
Jaccard ≥ t MUST share at least one prefix token under a common
global order, so verifying candidates with the exact Jaccard loses
nothing — output is identical to the O(n²) nested-loop join.

Why it matters here: the registry's dedup twins (x_dedup_ngram_jaccard
/ x_dedup_cluster_cc) used a blocked all-pairs join — fine as a test
oracle, wrong as a registered plan (VERDICT round-2 item 6). This
module gives them the same deterministic, oracle-matchable output on a
plan with NO all-pairs join, and gives the approx-dedup verification
contracts a sub-quadratic exact baseline they can compute in-query.

Plan shape (all linear scans + key shuffles):
  1. explode tokens, count document frequency per token  (1 shuffle)
  2. join df back, re-assemble each doc's tokens sorted by (df, tok)
     — the global order                                  (2 shuffles)
  3. explode only the prefix, self-join on the prefix token
     (+ optional blocking key), length-filter, distinct  (1 shuffle)
  4. verify candidates with the exact Jaccard            (2 shuffles)
At 100 TB the prefix tokens are by construction the RAREST tokens of
each doc, so the candidate join's key distribution is anti-skewed;
the only degenerate case is a massive exact-duplicate group, whose
output is itself quadratic in the group size (irreducible). Thresholds
are integer rationals (num/den) so prefix lengths use exact integer
arithmetic — a float ⌈0.8·5⌉ can evaluate to 5 instead of 4 and
silently truncate the prefix into false negatives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.functions.textfns import jaccard


def _ceil_div(a: Column, den: int) -> Column:
    """⌈a / den⌉ for non-negative integer column a and literal den.
    Computed as floor((a + den − 1) / den); the double division is
    exact-enough for floor because the quotient is only ever within
    rounding error of an integer when it IS that integer."""
    return F.floor((a + F.lit(den - 1)) / F.lit(den)).cast("int")


def _effective_threshold(num: int, den: int) -> tuple[int, int]:
    """The verification filter accepts round6(J) ≥ num/den, i.e. true
    Jaccard ≥ num/den − 5e-7. The prefix-length and length-ratio
    filters must prune against THAT effective threshold, not the
    nominal one — otherwise a pair whose true Jaccard sits in
    [t − 5e-7, t) rounds up and is kept by the nested-loop oracle but
    pruned here (reachable only once union sizes hit ~1e6 tokens, but
    closable exactly). 5e-7 = 1/2_000_000 exactly, so
    t_eff = (2e6·num − den) / (2e6·den) as an integer rational."""
    import math

    ne, de = 2_000_000 * num - den, 2_000_000 * den
    g = math.gcd(ne, de)
    return ne // g, de // g


def exact_jaccard_pairs(
    docs: DataFrame,
    threshold_num: int,
    threshold_den: int,
    id_col: str = "doc_id",
    set_col: str = "sh",
    block_cols: tuple[str, ...] = (),
    out_sim_col: str | None = "jaccard",
) -> DataFrame:
    """All pairs (id_a < id_b), optionally within the same block, with
    round6(Jaccard(set_a, set_b)) ≥ threshold_num/threshold_den.

    Output columns: doc_a, doc_b[, out_sim_col] — bit-identical to the
    brute-force nested-loop join (the rounding mirrors the DuckDB
    oracle twins: floor(j·1e6 + 0.5)/1e6 compared against the same
    double literal both engines parse).
    """
    from mcp_iceberg_duckdb_spark.operators._util import r6

    num, den = threshold_num, threshold_den
    assert 0 < num <= den, "threshold must be in (0, 1]"
    # prune against the EFFECTIVE (rounded) threshold — see
    # _effective_threshold for why nominal-t pruning is lossy
    num_e, den_e = _effective_threshold(num, den)
    blocks = list(block_cols)

    base = docs.select(id_col, *blocks, set_col).withColumn(
        "_len", F.size(set_col)
    )
    toks = base.select(
        id_col, *blocks, "_len", F.explode(set_col).alias("_tok")
    )
    dfc = toks.groupBy(*blocks, "_tok").agg(F.count("*").alias("_df"))
    ranked = toks.join(dfc, [*blocks, "_tok"])
    # rank each doc's tokens in the global (df asc, tok asc) order and
    # keep only ranks ≤ p = len − ⌈t·len⌉ + 1 (exact int math). A
    # row_number window over the token relation replaces the original
    # collect_list + array_sort + slice + explode re-assembly: same
    # total order (tokens are distinct within a doc, so (_df, _tok)
    # is total), same one doc-keyed exchange, but sort-based with
    # graceful spill instead of materializing a whole-doc struct
    # array per group — the re-assembly was the 500k-doc decade's
    # GC wall (measured: prefix stage 272 s → 53 s at t=1/2, where
    # the prefix is HALF of every document)
    from pyspark.sql import Window as _W

    rk_w = _W.partitionBy(id_col, *blocks).orderBy("_df", "_tok")
    prefix = (
        ranked.withColumn("_rk", F.row_number().over(rk_w))
        .withColumn(
            "_p",
            F.greatest(
                F.col("_len")
                - _ceil_div(F.col("_len").cast("bigint") * num_e, den_e)
                + 1,
                F.lit(1),
            ),
        )
        .filter(F.col("_rk") <= F.col("_p"))
        .select(id_col, *blocks, "_len", F.col("_tok").alias("_ptok"))
    )
    a = prefix.select(
        F.col(id_col).alias("_ida"),
        *[F.col(c).alias(f"_ba_{c}") for c in blocks],
        F.col("_len").alias("_la"),
        "_ptok",
    )
    b = prefix.select(
        F.col(id_col).alias("_idb"),
        *[F.col(c).alias(f"_bb_{c}") for c in blocks],
        F.col("_len").alias("_lb"),
        "_ptok",
    )
    cond = (
        (F.col("_ida") < F.col("_idb"))
        # length filter: J ≥ t_eff ⟹ min·den_e ≥ max·num_e
        & (
            F.least("_la", "_lb").cast("bigint") * den_e
            >= F.greatest("_la", "_lb").cast("bigint") * num_e
        )
    )
    for c in blocks:
        cond = cond & (F.col(f"_ba_{c}") == F.col(f"_bb_{c}"))
    cand = (
        a.join(b, on=["_ptok"])
        .filter(cond)
        .select("_ida", "_idb")
        .distinct()
    )
    # Array verification, NOT the narrow (id, token) join the
    # containment variant uses — measured both ways in round 15: at
    # the t=1/2 operating point (x_dedup_ngram_jaccard and the CC
    # family) the candidate set is large and the narrow verify
    # shuffles ~|set| rows PER candidate into a join+groupBy
    # (1.7× slower same-host), while the per-row array_intersect runs
    # in codegen on a broadcast-sized candidate list. The narrow form
    # wins only where assembled arrays are the spill hazard
    # (exact_containment_pairs, whose candidates carry ~KB sets and
    # reached 161M rows at 550k docs).
    sa = base.select(
        F.col(id_col).alias("_ida"), F.col(set_col).alias("_sha")
    )
    sb = base.select(
        F.col(id_col).alias("_idb"), F.col(set_col).alias("_shb")
    )
    thr = F.lit(num / den)  # same double literal the oracle SQL parses
    out = (
        cand.join(sa, "_ida")
        .join(sb, "_idb")
        .withColumn("_j", r6(jaccard(F.col("_sha"), F.col("_shb"))))
        .filter(F.col("_j") >= thr)
    )
    cols = [F.col("_ida").alias("doc_a"), F.col("_idb").alias("doc_b")]
    if out_sim_col is not None:
        cols.append(F.col("_j").alias(out_sim_col))
    return out.select(*cols)


def exact_containment_pairs(
    docs: DataFrame,
    threshold_num: int,
    threshold_den: int,
    id_col: str = "doc_id",
    set_col: str = "sh",
    block_cols: tuple[str, ...] = (),
    out_sim_col: str | None = "containment",
    min_len: int = 1,
    k_hits: int = 4,
) -> DataFrame:
    """All ORDERED pairs (id_a ≠ id_b, |set_a| ≥ min_len), optionally
    within the same block, with round6(|A∩B| / |A|) ≥
    threshold_num/threshold_den — asymmetric set CONTAINMENT
    (Broder's "A is roughly contained in B"), the near-dup relation
    Jaccard misses when a short document is embedded inside a much
    longer one (quote farms, page-in-page crawls, boilerplate-wrapped
    reposts): Jaccard(A,B) ≈ |A|/|B| → 0 as B grows, but C(A→B)
    stays 1. `min_len` gates the CONTAINED side only (B is
    unconstrained — that is the point): production pipelines apply a
    Gopher-style minimum-length filter before dedup anyway, and tiny
    sets are trivially "contained" everywhere, which is noise, not
    duplication signal.

    Candidate condition (SSJoin ICDE'06 containment form, k-extended
    MPJoin-style): C(A→B) ≥ t needs overlap α = ⌈t·|A|⌉, which
    depends only on the contained side — A contributes its prefix of
    length min(|A| − α + K, |A|) under the global (df asc, tok asc)
    order, joined against B's FULL token list, and by pigeonhole a
    qualifying pair must score ≥ min(K, α) prefix hits (unshared
    tokens ≤ |A| − α, so the first |A| − α + K positions hold ≥ K
    shared ones). The plain K=1 prefix is too weak against a full
    inverted list — measured 161M candidates for ~10⁵ true pairs at
    550k docs, because every prefix token contributes its whole df —
    while each +1 of K costs ONE more prefix token and multiplies
    candidates away. Two further lossless prunes ride on the same
    aggregation: the length filter |B| ≥ α, and a positional bound —
    the order-minimal shared token s* must sit in A's α-prefix (else
    unshared ≥ |A| − α + 1), and every B token ordered before s* is
    unshared, so overlap ≤ |B| − jmin + 1 where jmin is the smallest
    matched B position.

    Verification is exact but deliberately NARROW: candidates join
    back to the (doc, token) relation and count |A∩B| with one more
    groupBy — never to the assembled set arrays (two ~KB arrays per
    candidate row is the thing that spilled /tmp dry at 550k docs).
    Output is bit-identical to the O(n²) ordered nested-loop join
    restricted to |A| ≥ min_len."""
    from mcp_iceberg_duckdb_spark.operators._util import r6

    num, den = threshold_num, threshold_den
    assert 0 < num <= den, "threshold must be in (0, 1]"
    assert k_hits >= 1
    num_e, den_e = _effective_threshold(num, den)
    blocks = list(block_cols)

    base = docs.select(id_col, *blocks, set_col).withColumn(
        "_len", F.size(set_col)
    )
    toks = base.select(
        id_col, *blocks, "_len", F.explode(set_col).alias("_tok")
    )
    dfc = toks.groupBy(*blocks, "_tok").agg(F.count("*").alias("_df"))
    # α_eff = ⌈t_eff·len⌉; prefix p = min(len − α + K, len), required
    # prefix hits = min(K, α) — all exact integer arithmetic
    alpha = _ceil_div(F.col("_len").cast("bigint") * num_e, den_e)
    # rank tokens per doc under the global (df asc, tok asc) order via
    # a row_number window (round 15 — the exact_jaccard_pairs rewrite
    # applied here too): replaces the collect_list + array_sort +
    # slice/posexplode re-assembly, which materialized a whole-doc
    # struct array per group (the 500k-doc GC wall). The rank IS the
    # position annotation the jmin bound needs, so the container
    # side's posexplode falls out for free. The ranked relation is
    # persisted ONCE (narrow (id, len, tok, rank) rows) and serves the
    # prefix side, the full container side, and both verify sides —
    # the docs scan + shingle expansion runs once instead of four
    # times (VERDICT r14 item 3).
    from pyspark.sql import Window as _W

    rk_w = _W.partitionBy(id_col, *blocks).orderBy("_df", "_tok")
    rk = (
        toks.join(dfc, [*blocks, "_tok"])
        .withColumn("_rk", F.row_number().over(rk_w))
        .drop("_df")
        .persist()
    )
    a = (
        rk.filter(F.col("_len") >= min_len)
        .withColumn(
            "_p",
            F.least(
                F.greatest(
                    F.col("_len") - alpha + F.lit(k_hits), F.lit(1)
                ),
                F.col("_len"),
            ),
        )
        .filter(F.col("_rk") <= F.col("_p"))
        .select(
            F.col(id_col).alias("_ida"),
            *[F.col(c).alias(f"_ba_{c}") for c in blocks],
            F.col("_len").alias("_la"),
            F.least(F.lit(k_hits), F.greatest(alpha, F.lit(1))).alias(
                "_need"
            ),
            F.col("_tok").alias("_ptok"),
        )
    )
    # container side: FULL token list (the prefix theorem needs B
    # whole), position-annotated in the same global order for the
    # jmin bound — the window rank is exactly that position
    b = rk.select(
        F.col(id_col).alias("_idb"),
        *[F.col(c).alias(f"_bb_{c}") for c in blocks],
        F.col("_len").alias("_lb"),
        F.col("_rk").alias("_j"),
        F.col("_tok").alias("_ptok"),
    )
    cond = (
        (F.col("_ida") != F.col("_idb"))
        # overlap needs |B| ≥ ⌈t_eff·|A|⌉ ⟺ |B|·den_e ≥ |A|·num_e
        & (
            F.col("_lb").cast("bigint") * den_e
            >= F.col("_la").cast("bigint") * num_e
        )
    )
    for c in blocks:
        cond = cond & (F.col(f"_ba_{c}") == F.col(f"_bb_{c}"))
    cand = (
        a.join(b, on=["_ptok"])
        .filter(cond)
        .groupBy("_ida", "_idb")
        .agg(
            F.count("*").alias("_hits"),
            F.min("_j").alias("_jmin"),
            F.first("_la").alias("_la"),
            F.first("_lb").alias("_lb"),
            F.first("_need").alias("_need"),
        )
        .filter(
            (F.col("_hits") >= F.col("_need"))
            # overlap ≤ |B| − jmin + 1 must reach α
            & (
                (F.col("_lb") - F.col("_jmin") + 1).cast("bigint") * den_e
                >= F.col("_la").cast("bigint") * num_e
            )
        )
        .select("_ida", "_idb", "_la")
    )
    # verify from the persisted ranked relation (same rows as toks —
    # the df join is inner but every token has a count, and the rank
    # filter applies only on the a/b sides above)
    ta = rk.select(F.col(id_col).alias("_ida"), F.col("_tok").alias("_t"))
    tb = rk.select(F.col(id_col).alias("_idb"), F.col("_tok").alias("_t"))
    inter = (
        cand.join(ta, "_ida")
        .join(tb, ["_idb", "_t"])
        .groupBy("_ida", "_idb", "_la")
        .agg(F.count("*").alias("_inter"))
    )
    thr = F.lit(num / den)  # same double literal the oracle SQL parses
    out = inter.withColumn(
        "_c", r6(F.col("_inter") / F.col("_la").cast("double"))
    ).filter(F.col("_c") >= thr)
    cols = [F.col("_ida").alias("doc_a"), F.col("_idb").alias("doc_b")]
    if out_sim_col is not None:
        cols.append(F.col("_c").alias(out_sim_col))
    return out.select(*cols)


def exact_jaccard_join(
    left: DataFrame,
    right: DataFrame,
    threshold_num: int,
    threshold_den: int,
    id_col: str = "doc_id",
    set_col: str = "sh",
    block_cols: tuple[str, ...] = (),
    out_sim_col: str | None = "jaccard",
) -> DataFrame:
    """Cross-collection variant of :func:`exact_jaccard_pairs`: all
    (left, right) pairs with round6(Jaccard) ≥ t — the INCREMENTAL
    dedup shape, where a new batch joins against the existing corpus
    without re-pairing the corpus with itself.

    Same prefix-filtering theorem (Bayardo WWW'07 / Xiao WWW'08 R×S
    form): both sides' prefixes are taken under ONE global (df, tok)
    order computed over the union, so any qualifying cross pair must
    share a prefix token; exact-Jaccard verification then makes the
    output identical to the nested-loop cross join. Output columns:
    left_id, right_id[, out_sim_col]."""
    from mcp_iceberg_duckdb_spark.operators._util import r6

    num, den = threshold_num, threshold_den
    assert 0 < num <= den, "threshold must be in (0, 1]"
    # prune against the EFFECTIVE (rounded) threshold — see
    # _effective_threshold for why nominal-t pruning is lossy
    num_e, den_e = _effective_threshold(num, den)
    blocks = list(block_cols)

    l = left.select(id_col, *blocks, set_col).withColumn("_side", F.lit("l"))
    r = right.select(id_col, *blocks, set_col).withColumn("_side", F.lit("r"))
    base = l.unionByName(r).withColumn("_len", F.size(set_col))
    toks = base.select(
        "_side", id_col, *blocks, "_len", F.explode(set_col).alias("_tok")
    )
    dfc = toks.groupBy(*blocks, "_tok").agg(F.count("*").alias("_df"))
    # rank tokens per (side, doc) under the shared global (df, tok)
    # order via a row_number window instead of the collect_list +
    # array_sort + slice + explode re-assembly (the round-14 rewrite
    # already applied to exact_jaccard_pairs: sort-based with graceful
    # spill instead of whole-doc struct arrays per group — measured
    # 5× on the prefix stage at t=1/2, which is exactly this
    # function's x_dedup_incremental operating point)
    from pyspark.sql import Window as _W

    rk_w = _W.partitionBy("_side", id_col, *blocks).orderBy("_df", "_tok")
    prefix = (
        toks.join(dfc, [*blocks, "_tok"])
        .withColumn("_rk", F.row_number().over(rk_w))
        .withColumn(
            "_p",
            F.greatest(
                F.col("_len")
                - _ceil_div(F.col("_len").cast("bigint") * num_e, den_e)
                + 1,
                F.lit(1),
            ),
        )
        .filter(F.col("_rk") <= F.col("_p"))
        .select("_side", id_col, *blocks, "_len", F.col("_tok").alias("_ptok"))
    )
    a = prefix.filter(F.col("_side") == "l").select(
        F.col(id_col).alias("_ida"),
        *[F.col(c).alias(f"_ba_{c}") for c in blocks],
        F.col("_len").alias("_la"),
        "_ptok",
    )
    b = prefix.filter(F.col("_side") == "r").select(
        F.col(id_col).alias("_idb"),
        *[F.col(c).alias(f"_bb_{c}") for c in blocks],
        F.col("_len").alias("_lb"),
        "_ptok",
    )
    cond = (
        F.least("_la", "_lb").cast("bigint") * den_e
        >= F.greatest("_la", "_lb").cast("bigint") * num_e
    )
    for c in blocks:
        cond = cond & (F.col(f"_ba_{c}") == F.col(f"_bb_{c}"))
    cand = a.join(b, on=["_ptok"]).filter(cond).select("_ida", "_idb").distinct()
    # array verification — see exact_jaccard_pairs for why the narrow
    # (id, token) verify was measured and reverted at this operating
    # point (t=1/2, large candidate sets, small arrays)
    sa = left.select(F.col(id_col).alias("_ida"), F.col(set_col).alias("_sha"))
    sb = right.select(F.col(id_col).alias("_idb"), F.col(set_col).alias("_shb"))
    thr = F.lit(num / den)
    out = (
        cand.join(sa, "_ida")
        .join(sb, "_idb")
        .withColumn("_j", r6(jaccard(F.col("_sha"), F.col("_shb"))))
        .filter(F.col("_j") >= thr)
    )
    cols = [F.col("_ida").alias("left_id"), F.col("_idb").alias("right_id")]
    if out_sim_col is not None:
        cols.append(F.col("_j").alias(out_sim_col))
    return out.select(*cols)
