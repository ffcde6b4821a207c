"""High-entropy (Zipfian ~50k-vocabulary) corpus tier generator.

The driver-generated documents tables draw from a 31-word vocabulary
(985 distinct 4-gram shingles at sf0.1), which puts every prefix-filter
/ token-rarity operator (ppjoin, containment's prefix tier) in its
documented degenerate regime and makes corpus-linguistics readouts
(zipf slope, heaps growth, hapax ratio) trivial. This tool synthesizes
the SAME documents schema over a deterministic seeded Zipfian
vocabulary — the regime a real code/text lake lives in — so those
operators can be measured doing the work they were designed for.

Output directory layout = a testdata sf dir: a fresh
``documents.parquet`` plus symlinks to every other table of the source
sf dir (embeddings, TPC-H relations, events are corpus-independent).
``doc_id``, ``lang``, ``source`` are copied row-for-row from the source
documents table so joins and per-lang rollups keep their shape; only
``text`` / ``n_chars`` change.

Determinism: one numpy PCG64 stream seeded from (seed, doc_id) per
document — same invocation → byte-identical parquet content (the
corpus.py:108 seeded-generation idiom; reference analog
twinspect/datasets/ultils.py:18-31 seeded sampling).

Planted near-dup structure (so dedup operators have real work):
- doc_id % 10 == 1: near-dup of doc_id-1 — word-substitution rate
  2%·(1 + doc_id % 7), spanning both sides of the 0.7 shingle-Jaccard
  threshold (borderline pairs exercise the LCS-rescue band);
- doc_id % 97 == 53: byte-identical copy of doc_id-1 (exact-dup tier);
- everything else: fresh Zipfian text, length matched to the source
  row's n_chars (size distribution preserved).

Usage: python tools/gen_hient.py SRC_SF_DIR OUT_DIR [seed]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

VOCAB_SIZE = 50_000
ZIPF_S = 1.07  # classic text exponent; keeps a long informative tail
WORD_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def build_vocab(seed: int) -> np.ndarray:
    """50k distinct random 3-10 letter words, rank order = frequency
    order (index 0 = most frequent)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    words = set()
    out = []
    while len(out) < VOCAB_SIZE:
        n = int(rng.integers(3, 11))
        w = "".join(rng.choice(WORD_LETTERS, size=n))
        if w not in words:
            words.add(w)
            out.append(w)
    return np.array(out, dtype=object)


def zipf_cdf() -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
    return np.cumsum(p / p.sum())


def sample_words(rng, cdf: np.ndarray, n: int) -> np.ndarray:
    return np.searchsorted(cdf, rng.random(n), side="right")


def gen_text(rng, cdf, vocab, target_chars: int) -> str:
    # draw in one batch sized generously, then trim at the word that
    # crosses target_chars (docs end on a word boundary, like the source)
    est = max(8, target_chars // 5)
    idx = sample_words(rng, cdf, est * 2)
    words = vocab[idx]
    lens = np.fromiter((len(w) + 1 for w in words), dtype=np.int64)
    cum = np.cumsum(lens)
    cut = int(np.searchsorted(cum, target_chars, side="left")) + 1
    return " ".join(words[:cut])


def substitute(rng, cdf, vocab, text: str, rate: float) -> str:
    toks = text.split(" ")
    n = len(toks)
    k = max(1, int(round(n * rate)))
    pos = rng.choice(n, size=min(k, n), replace=False)
    repl = sample_words(rng, cdf, len(pos))
    for p, r in zip(pos, repl):
        toks[p] = vocab[r]
    return " ".join(toks)


def generate(src_dir: str, out_dir: str, seed: int = 11) -> None:
    src = pd.read_parquet(os.path.join(src_dir, "documents.parquet"))
    src = src.sort_values("doc_id").reset_index(drop=True)
    vocab = build_vocab(seed)
    cdf = zipf_cdf()

    texts: list[str] = []
    for row in src.itertuples(index=False):
        did = int(row.doc_id)
        rng = np.random.Generator(np.random.PCG64([seed, did]))
        if did % 97 == 53 and texts:
            texts.append(texts[-1])  # exact copy of doc_id-1
        elif did % 10 == 1 and texts:
            rate = 0.02 * (1 + did % 7)
            texts.append(substitute(rng, cdf, vocab, texts[-1], rate))
        else:
            texts.append(gen_text(rng, cdf, vocab, int(row.n_chars)))

    out = pd.DataFrame(
        {
            "doc_id": src["doc_id"],
            "text": texts,
            "lang": src["lang"],
            "source": src["source"],
            "n_chars": np.fromiter(
                (len(t) for t in texts), dtype=np.int64
            ),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    out.to_parquet(os.path.join(out_dir, "documents.parquet"), index=False)
    for f in sorted(os.listdir(src_dir)):
        if f == "documents.parquet" or not f.endswith(".parquet"):
            continue
        dst = os.path.join(out_dir, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(src_dir, f), dst)
    print(
        f"hient tier at {out_dir}: {len(out)} docs, "
        f"{out['n_chars'].sum()} chars, vocab={VOCAB_SIZE}, seed={seed}"
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.hient/sf0.01"
    sd = int(sys.argv[3]) if len(sys.argv) > 3 else 11
    generate(src, dst, sd)
