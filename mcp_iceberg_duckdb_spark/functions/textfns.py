"""Text-processing expression builders: tokenization, shingling,
MinHash signatures, SimHash, banding — the primitives behind the
tier-X dedup/text operators (SURVEY.md §2.11).

Everything here is a Catalyst expression (split / transform /
aggregate / xxhash64): hashing and folding run inside whole-stage
codegen, so a 100 TB dedup pass never leaves the JVM. xxhash64 with a
literal seed column provides the seeded hash family for MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English stopword list — used by language-ID heuristic and
# quality scoring; mirrored verbatim in the DuckDB oracle SQL.
EN_STOPWORDS = (
    "the",
    "a",
    "of",
    "and",
    "to",
    "in",
    "is",
    "it",
    "that",
    "for",
)


def bind(col: Column, fn) -> Column:
    """Let-binding for expressions: evaluate ``col`` ONCE and pass the
    result to ``fn`` as a lambda variable.

    Catalyst's ProjectCollapse inlines projected columns into every
    use site, and higher-order-function lambdas are interpreted (not
    codegen'd), so an expensive array expression referenced N times is
    computed N times. Wrapping it as the element of a 1-element array
    and binding it through transform() forces single evaluation —
    measured 30× on the MinHash signature (32 references to the
    shingle array)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def tokens(text: Column | str) -> Column:
    """Single-space tokenization — the ONE tokenizer every operator
    and every DuckDB oracle (string_split(text, ' ')) shares, so
    token counts agree engine-to-engine even on consecutive-space /
    tab / leading-whitespace input (both sides emit the same empty
    tokens). Real corpora would normalize whitespace first; a \\s+
    split here would silently diverge from the oracles on
    multi-space input (round-2 advisory, ADVICE.md)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles. Docs shorter than k words yield one
    (short) shingle so no document hashes to an empty signature.

    The token array is let-bound so the regex split runs once per
    doc, not once per shingle index (measured: 3-5× on warm runs;
    an arrays_zip-of-shifted-slices variant benched slightly slower
    than this slice-per-index form, so the simpler one stays)."""

    def _shingle(toks: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
        return F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
        )

    return bind(tokens(text), _shingle)


def _seeded_hash(seed: int):
    # NB: must be a single-parameter lambda — PySpark interprets a
    # two-parameter transform() lambda as the (element, index) form,
    # so `lambda x, s=seed: ...` would silently receive the array
    # index as s.
    return lambda x: F.xxhash64(x, F.lit(seed))


def minhash_signature(shingles: Column, n_hashes: int = 32) -> Column:
    """MinHash signature: for seed s, min over shingles of
    xxhash64(shingle, s). Returns array<bigint> of length n_hashes.
    The shingle array is let-bound: without it, the n_hashes array
    elements would each re-evaluate the full shingle expression
    (measured: 32× slowdown on the dedup pipeline)."""
    return bind(
        shingles,
        lambda sh: F.array(
            *[F.array_min(F.transform(sh, _seeded_hash(s))) for s in range(n_hashes)]
        ),
    )


def lsh_bands(signature: Column, n_bands: int, rows_per_band: int) -> Column:
    """Hash each band of the signature to one bigint; returns
    array<bigint> of length n_bands. Two docs are LSH candidates iff
    they collide in at least one band. Signature let-bound (referenced
    n_bands × rows_per_band times)."""
    return bind(
        signature,
        lambda sig: F.array(
            *[
                F.xxhash64(
                    F.lit(b),
                    *[
                        F.element_at(sig, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
                for b in range(n_bands)
            ]
        ),
    )


def simhash64(toks: Column) -> Column:
    """64-bit SimHash: per token, xxhash64 → ±1 votes per bit
    position; final bit = sign of the vote sum. One sequential fold
    per document — O(tokens × 64) JVM ops, no shuffle, no Python.

    Returned as bigint (bit 63 is the sign bit — compare with
    hamming_distance, not arithmetic order).
    """
    # shift amounts must be literal ints (shiftright takes no Column
    # count), so the 64 bit positions are unrolled at plan-build time
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, tok: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(F.xxhash64(tok), i).bitwiseAND(F.lit(1)).cast("long")
                    * 2
                    - 1
                    for i in range(64)
                ]
            ),
            lambda a, v: a + v,
        ),
    )

    # fold votes (LSB first) into one bigint: Σ [voteᵢ>0] · 2ⁱ.
    # let-bound: the 64 bit terms reference the vote array — without
    # bind() each would re-run the whole fold over the tokens.
    def _pack(v: Column) -> Column:
        out = None
        for i in range(64):
            term = F.shiftleft(
                F.when(
                    F.element_at(v, i + 1) > 0, F.lit(1).cast("long")
                ).otherwise(F.lit(0).cast("long")),
                i,
            )
            out = term if out is None else out.bitwiseXOR(term)
        return out

    return bind(votes, _pack)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount of
    XOR via bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def jaccard(set_a: Column, set_b: Column) -> Column:
    """Exact Jaccard similarity of two deduplicated arrays."""
    return F.size(F.array_intersect(set_a, set_b)).cast("double") / F.nullif(
        F.size(F.array_union(set_a, set_b)).cast("double"), F.lit(0.0)
    )
