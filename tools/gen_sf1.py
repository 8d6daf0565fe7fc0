"""Deterministic sf1-scale soak data: ``documents.parquet`` (50 000
rows) and ``embeddings.parquet`` (20 000 unit vectors) — 10× the
driver's sf0.1 tables, matching their observed distributions (31-word
vocabulary, lang mix, src0..19 sources, ~44-580 char texts, unit-norm
64-d embeddings in 10 label clusters) plus injected exact/near
duplicate structure so the dedup family has real work at scale.

``--full`` (round-6 directive #5) additionally scales the relational
driver tables to sf1 by TILING the read-only sf0.1 parquet 10× with
FK-consistent key shifts: every entity key (custkey, orderkey,
partkey, suppkey, event_id, user_id) is offset by copy × (max_key+1)
in its home table AND in every referencing column, so joins produce
10× the rows with identical per-key structure; nation/region (bounded
dims) copy verbatim and nationkey references stay valid. Non-key
columns duplicate exactly — the soak's parity gate compares Spark vs
DuckDB on the SAME files, so duplication affects workload realism,
not correctness, while keeping every literal predicate in the catalog
(status flags, event types, date ranges) populated.

The driver's /root/testdata is read-only and tops out at sf0.1; this
generator (seed=42, pure numpy/pyarrow — no Spark needed) lets
``tools/parity_check.py`` and the candidate-growth property tests run
one tier further. Default output: /tmp/spark_graft_sf1 (regenerated on
demand, never committed).

Usage: python tools/gen_sf1.py [outdir] [--docs N] [--vecs N] [--full]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# the sf0.1 documents vocabulary (31 words, extracted once; embedding
# it as a literal keeps the generator runnable without the driver dir)
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(n_docs: int, rng: np.random.Generator) -> pa.Table:
    vocab = np.array(VOCAB)
    n_words = rng.integers(8, 110, size=n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        if i and i % 250 == 0:
            texts.append(texts[i - 1])            # exact duplicate
            continue
        words = vocab[rng.integers(0, len(vocab), size=int(n_words[i]))]
        if i and i % 100 == 0:
            # near-duplicate of the previous doc: ~2 words mutated
            prev = texts[i - 1].split()
            for j in rng.integers(0, max(1, len(prev)), size=2):
                prev[int(j)] = str(vocab[int(rng.integers(0, len(vocab)))])
            texts.append(" ".join(prev))
            continue
        texts.append(" ".join(words))
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_documents_realistic(
    n_docs: int,
    rng: np.random.Generator,
    vocab_size: int = 50_000,
    zipf_s: float = 1.07,
) -> pa.Table:
    """Round-7 directive #1: a REALISTIC-vocabulary corpus for the
    dedup soak. The legacy 31-word vocabulary makes every 3-word
    shingle hot (31³ possible shingles, all frequent), so the
    prefix/pigeonhole pruning the dedup family's 100 TB story rests on
    was never exercised — candidates degenerated toward worst case and
    "prunes well" stayed asserted, not demonstrated.

    Here token frequencies follow a bounded Zipf law (rank^-s over
    ``vocab_size`` ≥ 50k distinct syllable-composed words, s ≈ 1.07 —
    the classic fit for natural text), so shingle document-frequency
    has the realistic long tail: a few hot boilerplate shingles, a
    vast majority that appear in O(1) docs. Duplicate structure
    matches the legacy generator (every 250th doc an exact copy, every
    100th a ~4 %-mutated near-copy) plus 20 shared 8-word boilerplate
    headers on every 4th doc — the realistic source of hot shingles
    (real corpora have headers/footers, not uniform soup)."""
    syls = np.array([c + v for c in "bcdfghjklmnpqrstvwz"
                     for v in "aeiou"])
    n_s = len(syls)
    if vocab_size > n_s ** 3:
        raise ValueError(f"vocab_size caps at {n_s ** 3}")
    idx = np.arange(vocab_size)
    vocab = np.char.add(
        np.char.add(syls[idx // (n_s * n_s) % n_s], syls[(idx // n_s) % n_s]),
        syls[idx % n_s],
    )
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    p = ranks ** -zipf_s
    p /= p.sum()
    n_words = np.clip(
        rng.lognormal(4.4, 0.6, size=n_docs), 20, 400
    ).astype(np.int64)
    toks = rng.choice(vocab_size, size=int(n_words.sum()), p=p)
    templates = [
        " ".join(vocab[rng.choice(vocab_size, size=8, p=p)])
        for _ in range(20)
    ]
    texts: list[str] = []
    off = 0
    for i in range(n_docs):
        words = vocab[toks[off:off + n_words[i]]]
        off += int(n_words[i])
        if i and i % 250 == 0:
            texts.append(texts[i - 1])            # exact duplicate
            continue
        if i and i % 100 == 0:
            # near-duplicate: ~4% of tokens mutated (Zipf-resampled)
            prev = texts[i - 1].split()
            n_mut = max(1, len(prev) // 25)
            for j in rng.integers(0, len(prev), size=n_mut):
                prev[int(j)] = str(vocab[int(rng.choice(vocab_size, p=p))])
            texts.append(" ".join(prev))
            continue
        t = " ".join(words)
        if i % 4 == 0:
            t = templates[(i // 4) % len(templates)] + " " + t
        texts.append(t)
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_documents_adversarial(
    n_docs: int,
    rng: np.random.Generator,
    cluster_size: int = 10_000,
    vocab_size: int = 50_000,
    zipf_s: float = 1.07,
) -> pa.Table:
    """Round-8 directive #4: the realistic-vocabulary corpus with ONE
    pathological near-duplicate cluster — ``cluster_size`` independent
    ~2 %-mutated copies of a single 120-word base document, scattered
    uniformly through the doc-id space. Every pair within the cluster
    has Jaccard ≫ 0.3, so the TRUE output is quadratic in the cluster
    (~cluster²/2 pairs) and every prefix shingle / LSH band bucket of
    a cluster member contains (almost) the whole cluster: the worst
    case the hot-group salt-splits exist for. The rest of the corpus
    is the standard realistic-vocab stream (no injected duplicates, so
    measured work isolates the cluster)."""
    base_tbl = gen_documents_realistic(n_docs, rng, vocab_size, zipf_s)
    texts = base_tbl.column("text").to_pylist()
    # remove the generator's own duplicate structure: re-randomize the
    # every-100th/250th copies so the cluster is the only hot spot
    syls = np.array([c + v for c in "bcdfghjklmnpqrstvwz"
                     for v in "aeiou"])
    n_s = len(syls)
    idx = np.arange(vocab_size)
    vocab = np.char.add(
        np.char.add(syls[idx // (n_s * n_s) % n_s], syls[(idx // n_s) % n_s]),
        syls[idx % n_s],
    )
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    p = ranks ** -zipf_s
    p /= p.sum()
    for i in range(0, n_docs, 50):
        if i and (i % 100 == 0 or i % 250 == 0):
            texts[i] = " ".join(vocab[rng.choice(vocab_size, size=80, p=p)])
    base_words = list(vocab[rng.choice(vocab_size, size=120, p=p)])
    cluster_slots = rng.choice(n_docs, size=cluster_size, replace=False)
    for slot in cluster_slots:
        words = list(base_words)
        # ~2% independent mutation: 2-3 words resampled
        for j in rng.integers(0, len(words), size=int(rng.integers(2, 4))):
            words[int(j)] = str(vocab[int(rng.choice(vocab_size, p=p))])
        texts[int(slot)] = " ".join(words)
    return pa.table({
        "doc_id": base_tbl.column("doc_id"),
        "text": pa.array(texts, pa.string()),
        "lang": base_tbl.column("lang"),
        "source": base_tbl.column("source"),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n_vecs: int, rng: np.random.Generator) -> pa.Table:
    dim, n_labels = 64, 10
    cents = rng.standard_normal((n_labels, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, n_labels, size=n_vecs)
    vecs = cents[labels] + 0.6 * rng.standard_normal((n_vecs, dim))
    # inject near-duplicate pairs (every 200th ≈ tiny perturbation of
    # its predecessor) BEFORE normalizing, so cosine stays ≈ 1
    for i in range(200, n_vecs, 200):
        vecs[i] = vecs[i - 1] + 0.01 * rng.standard_normal(dim)
        labels[i] = labels[i - 1]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })


SRC_DIR = "/root/testdata/sf0.1"

# table -> {column: key_space} for every key-bearing column; the same
# key space gets the same shift everywhere it appears (FK consistency)
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
}
USER_COL = {"events": "user_id"}


def tile_relational(outdir: str, copies: int = 10) -> None:
    """Write region/nation verbatim and the fact/dim tables tiled
    ``copies``× with per-key-space shifts (copy × (max+1))."""
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(os.path.join(SRC_DIR, f"{t}.parquet")),
                       os.path.join(outdir, f"{t}.parquet"))
    # key-space shift = max over EVERY column sharing the space + 1
    space_max: dict[str, int] = {}
    tables = {}
    for t, colmap in KEYED.items():
        tables[t] = pq.read_table(os.path.join(SRC_DIR, f"{t}.parquet"))
        for col, space in colmap.items():
            m = int(pa.compute.max(tables[t][col]).as_py())
            space_max[space] = max(space_max.get(space, 0), m)
    shift = {sp: m + 1 for sp, m in space_max.items()}
    for t, colmap in KEYED.items():
        base = tables[t]
        parts = []
        for c in range(copies):
            cols = {}
            for name in base.column_names:
                arr = base[name]
                if name in colmap and c:
                    arr = pa.compute.add(
                        arr.combine_chunks(),
                        pa.scalar(c * shift[colmap[name]], pa.int64()),
                    )
                cols[name] = arr
            parts.append(pa.table(cols))
        pq.write_table(pa.concat_tables(parts),
                       os.path.join(outdir, f"{t}.parquet"))


def generate(outdir: str, n_docs: int = 50_000, n_vecs: int = 20_000,
             full: bool = False, realistic_vocab: bool = False,
             adversarial_cluster: int = 0) -> str:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)
    if adversarial_cluster:
        def docgen(n, r):
            return gen_documents_adversarial(
                n, r, cluster_size=adversarial_cluster)
    else:
        docgen = gen_documents_realistic if realistic_vocab else gen_documents
    pq.write_table(docgen(n_docs, rng),
                   os.path.join(outdir, "documents.parquet"))
    pq.write_table(gen_embeddings(n_vecs, rng),
                   os.path.join(outdir, "embeddings.parquet"))
    if full:
        tile_relational(outdir)
    return outdir


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("outdir", nargs="?", default="/tmp/spark_graft_sf1")
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--vecs", type=int, default=20_000)
    ap.add_argument("--full", action="store_true",
                    help="also tile the relational driver tables 10x")
    ap.add_argument("--realistic-vocab", action="store_true",
                    help="Zipf token frequencies over a 50k-word "
                         "vocabulary (dedup-soak corpus) instead of "
                         "the 31-word sf0.1 lookalike")
    ap.add_argument("--adversarial-cluster", type=int, default=0,
                    help="realistic-vocab corpus with ONE N-member "
                         "near-duplicate cluster (hot-group soak)")
    args = ap.parse_args()
    out = generate(args.outdir, args.docs, args.vecs, args.full,
                   args.realistic_vocab, args.adversarial_cluster)
    print(f"wrote {out}: documents={args.docs} embeddings={args.vecs}"
          + (" + relational tables at 10x sf0.1" if args.full else "")
          + (" [realistic vocab]" if args.realistic_vocab else ""))


if __name__ == "__main__":
    main()
