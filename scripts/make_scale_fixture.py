"""Deterministic scale-fixture generator for the documents/embeddings
family — the inputs of the text/dedup heavyweight queries.

The driver ships fixtures up to sf0.1 (5,000 docs / 2,000 vectors);
the 100 TB design claims rest on linearity arguments that deserve at
least one measured decade of scaling (VERDICT round-4, "Next round"
item 4). This script regenerates the corpus at ANY size, mimicking the
sf0.1 fixture's empirical distributions (measured read-only from
/root/testdata/sf0.1):

- 31-token vocabulary with the fixture's unigram probabilities
- per-doc token-length distribution resampled from the fixture
- 20 uniform sources, 5-language empirical split
- planted exact duplicates (~0.16%, the fixture's rate) and planted
  near-duplicates (2%, 90% token overlap) so dedup operators have a
  scale-proportional true-positive set
- embeddings drawn per label from the fixture's per-(label, dim)
  mean/std, 64-dim float32, empirical label mix

Crucially the SAME generator (same seed policy) produces every scale,
so cross-scale wall-time RATIOS compare like with like — generator
output vs generator output — instead of fixture vs generator.

The remaining tables (region..lineitem, events) are copied from sf0.1
unchanged: the scaling subset only touches documents/embeddings, and
bench.py refuses nothing — absent tables would just fail loudly.

Usage:
    python scripts/make_scale_fixture.py OUT_DIR N_DOCS N_VECS [SEED]

Writes OUT_DIR/{documents,embeddings}.parquet (+ copies of the other
fixture tables). Never touches /root/testdata.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC_SF_DIR = Path("/root/testdata/sf0.1")
_EXACT_DUP_FRAC = 0.0016
_NEAR_DUP_FRAC = 0.02
_NEAR_DUP_OVERLAP = 0.9
_N_SOURCES = 20
_DIM = 64


def _fixture_document_stats():
    tbl = pq.read_table(SRC_SF_DIR / "documents.parquet", columns=["text", "lang"])
    texts = tbl.column("text").to_pylist()
    langs = tbl.column("lang").to_pylist()
    tok_lists = [t.split(" ") for t in texts]
    vocab_counts: dict[str, int] = {}
    for toks in tok_lists:
        for w in toks:
            vocab_counts[w] = vocab_counts.get(w, 0) + 1
    vocab = sorted(vocab_counts)
    counts = np.array([vocab_counts[w] for w in vocab], dtype=np.float64)
    lang_vals = sorted(set(langs))
    lang_counts = np.array([langs.count(v) for v in lang_vals], dtype=np.float64)
    lengths = np.array([len(toks) for toks in tok_lists], dtype=np.int64)
    return (
        np.array(vocab),
        counts / counts.sum(),
        lengths,
        np.array(lang_vals),
        lang_counts / lang_counts.sum(),
    )


def _fixture_embedding_stats():
    tbl = pq.read_table(SRC_SF_DIR / "embeddings.parquet", columns=["embedding", "label"])
    emb = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    lab = np.array(tbl.column("label").to_pylist(), dtype=np.int64)
    labels = np.unique(lab)
    means = np.stack([emb[lab == l].mean(axis=0) for l in labels])
    stds = np.stack([emb[lab == l].std(axis=0) for l in labels])
    probs = np.array([(lab == l).sum() for l in labels], dtype=np.float64)
    return labels, means, stds, probs / probs.sum()


def make_documents(out: Path, n_docs: int, seed: int) -> None:
    vocab, probs, lengths, lang_vals, lang_probs = _fixture_document_stats()
    rng = np.random.RandomState(seed)
    doc_lens = rng.choice(lengths, size=n_docs, replace=True)
    flat = rng.choice(len(vocab), size=int(doc_lens.sum()), p=probs)
    offsets = np.concatenate([[0], np.cumsum(doc_lens)])
    docs = [vocab[flat[offsets[i] : offsets[i + 1]]] for i in range(n_docs)]
    # planted near-duplicates: overwrite doc i with a 90%-overlap copy
    # of an earlier doc (pair structure scales linearly with n_docs)
    n_near = int(n_docs * _NEAR_DUP_FRAC)
    for i in rng.choice(np.arange(1, n_docs), size=n_near, replace=False):
        j = rng.randint(0, i)
        base = docs[j].copy()
        n_swap = max(1, int(len(base) * (1 - _NEAR_DUP_OVERLAP)))
        pos = rng.choice(len(base), size=min(n_swap, len(base)), replace=False)
        base[pos] = vocab[rng.choice(len(vocab), size=len(pos), p=probs)]
        docs[i] = base
    # planted exact duplicates, the fixture's observed rate
    n_exact = max(1, int(n_docs * _EXACT_DUP_FRAC))
    for i in rng.choice(np.arange(1, n_docs), size=n_exact, replace=False):
        docs[i] = docs[rng.randint(0, i)]
    texts = [" ".join(d) for d in docs]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(
                rng.choice(lang_vals, size=n_docs, p=lang_probs), type=pa.string()
            ),
            "source": pa.array(
                [f"src{i % _N_SOURCES}" for i in range(n_docs)], type=pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, out / "documents.parquet")


def make_embeddings(
    out: Path, n_vecs: int, seed: int, label_split: int = 1
) -> None:
    """``label_split`` > 1 splits every fixture label into that many
    distinct sub-centroids (shifted by a deterministic ±1σ offset,
    within-cluster spread halved so sub-clusters are separable).
    This is the SemDeDup scaling recipe made concrete: cluster count
    k must GROW with the corpus (the paper runs k≈11k for 600 M
    docs) so per-cluster sizes — and with them the Σ(size²) pair
    join — stay bounded. A fixed-k scale-up measures the documented
    quadratic-per-cluster behavior instead; the scaling bench runs
    both to show the knob working."""
    labels, means, stds, probs = _fixture_embedding_stats()
    rng = np.random.RandomState(seed + 1)
    if label_split > 1:
        shift = rng.randn(len(labels) * label_split, _DIM)
        means = np.repeat(means, label_split, axis=0) + shift * np.repeat(
            stds, label_split, axis=0
        )
        stds = np.repeat(stds, label_split, axis=0) * 0.5
        labels = np.arange(len(means))
        probs = np.repeat(probs / label_split, label_split)
        probs = probs / probs.sum()
    idx = rng.choice(len(labels), size=n_vecs, p=probs)
    vecs = (means[idx] + rng.randn(n_vecs, _DIM) * stds[idx]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), type=pa.int64()),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
            "label": pa.array(labels[idx], type=pa.int32()),
        }
    )
    pq.write_table(tbl, out / "embeddings.parquet")


def main() -> None:
    out = Path(sys.argv[1])
    n_docs, n_vecs = int(sys.argv[2]), int(sys.argv[3])
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 7
    label_split = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    out.mkdir(parents=True, exist_ok=True)
    make_documents(out, n_docs, seed)
    make_embeddings(out, n_vecs, seed, label_split)
    for p in SRC_SF_DIR.glob("*.parquet"):
        if p.stem not in ("documents", "embeddings"):
            shutil.copy(p, out / p.name)
    print(f"wrote {out}: {n_docs} docs, {n_vecs} vecs (seed {seed})")


if __name__ == "__main__":
    main()
