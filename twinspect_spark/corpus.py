"""Deterministic synthetic ground-truth corpus of source-code files.

TwinSpect builds labeled corpora of near-duplicate media by applying a
registry of transformations to originals and mixing in distractors
(reference: docs/datasets.md:20-39 folder convention; transformation
registry config.yml:124-194; clusterize twinspect/datasets/ultils.py:43-57;
seeded sampling ultils.py:18-31). Our analog generates *source-code* files
(per BASELINE.json input_hint) with labeled edit transforms, and tracks
ground truth in a `labels` table instead of the filesystem layout.

Everything is seeded `random.Random` — same seed → byte-identical corpus
(the reference's determinism-by-construction, SURVEY.md §5).
"""

from __future__ import annotations

import random
from dataclasses import dataclass

import pandas as pd

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega value result item "
    "node edge graph index count total buffer stream record batch chunk"
).split()

_FUNCS = ["load", "parse", "build", "merge", "score", "filter", "emit", "scan"]


def _gen_function(rng: random.Random, name: str) -> str:
    args = rng.sample(_WORDS, rng.randint(1, 3))
    lines = [f"def {name}({', '.join(args)}):"]
    lines.append(f'    """{rng.choice(_WORDS)} {rng.choice(_WORDS)} helper."""')
    for _ in range(rng.randint(3, 8)):
        lhs = rng.choice(_WORDS)
        op = rng.choice(["+", "-", "*", "//", "%"])
        rhs1, rhs2 = rng.choice(_WORDS + args), rng.choice(args + ["1", "2", "10"])
        lines.append(f"    {lhs} = {rhs1} {op} {rhs2}  # {rng.choice(_WORDS)}")
    lines.append(f"    return {rng.choice(args)}")
    return "\n".join(lines)


def _gen_file(rng: random.Random) -> str:
    n_funcs = rng.randint(2, 5)
    names = rng.sample(_FUNCS, n_funcs)
    header = f"# module {rng.choice(_WORDS)}_{rng.randint(0, 999)}\nimport os\nimport sys\n"
    return header + "\n\n".join(_gen_function(rng, n) for n in names) + "\n"


# --- edit-transform registry (analog of reference config.yml:124-194) ------
def _t_rename(rng: random.Random, text: str) -> str:
    """Identifier rename: swap one frequent word for a fresh token."""
    word = rng.choice([w for w in _WORDS if w in text] or _WORDS)
    return text.replace(word, f"{word}_{rng.randint(0, 99)}")


def _t_comment_churn(rng: random.Random, text: str) -> str:
    lines = text.split("\n")
    for i, ln in enumerate(lines):
        if "#" in ln and rng.random() < 0.5:
            lines[i] = ln.split("#")[0] + f"# {rng.choice(_WORDS)} edited"
    return "\n".join(lines)


def _t_whitespace(rng: random.Random, text: str) -> str:
    lines = text.split("\n")
    out = []
    for ln in lines:
        out.append(ln + ("  " if rng.random() < 0.3 else ""))
        if rng.random() < 0.1:
            out.append("")
    return "\n".join(out)


def _t_reorder(rng: random.Random, text: str) -> str:
    """Function reorder: rotate the def-blocks."""
    parts = text.split("\n\n")
    if len(parts) > 2:
        body = parts[1:]
        rot = rng.randint(1, len(body) - 1)
        parts = [parts[0]] + body[rot:] + body[:rot]
    return "\n\n".join(parts)


def _t_insert(rng: random.Random, text: str) -> str:
    lines = text.split("\n")
    pos = rng.randint(1, len(lines) - 1)
    lines.insert(pos, f"{rng.choice(_WORDS)} = {rng.randint(0, 9)}")
    return "\n".join(lines)


TRANSFORMS = {
    "rename": _t_rename,
    "comment_churn": _t_comment_churn,
    "whitespace": _t_whitespace,
    "reorder": _t_reorder,
    "insert": _t_insert,
}


@dataclass
class Corpus:
    files: pd.DataFrame   # repo, path, commit, lang, content
    labels: pd.DataFrame  # repo, path, commit, cluster_id, transform, is_original


def generate_corpus(
    n_clusters: int = 40,
    transforms_per_original: int = 3,
    n_distractors: int = 60,
    n_exact_dups: int = 10,
    seed: int = 7,
) -> Corpus:
    """Planted-cluster corpus: each cluster = 1 original + T labeled
    transforms (+ optionally an exact byte-copy); distractors are unique
    files that must not match anything."""
    rng = random.Random(seed)
    files, labels = [], []

    def add(repo, path, content, cluster_id, transform, is_original):
        commit = f"{rng.getrandbits(160):040x}"
        files.append((repo, path, commit, "python", content))
        labels.append((repo, path, commit, cluster_id, transform, is_original))

    for c in range(n_clusters):
        repo = f"org{c % 7}/repo{c}"
        original = _gen_file(rng)
        add(repo, f"src/pkg{c}/mod0.py", original, c, None, True)
        names = rng.sample(sorted(TRANSFORMS), transforms_per_original)
        for j, tname in enumerate(names):
            edited = TRANSFORMS[tname](rng, original)
            add(repo, f"src/pkg{c}/mod0_v{j + 1}.py", edited, c, tname, False)
        if c < n_exact_dups:  # byte-identical copy in another repo (D1 targets)
            add(f"fork/{repo}", f"src/pkg{c}/mod0.py", original, c, "exact_copy", False)

    for d in range(n_distractors):
        add(f"solo/repo{d}", f"lib/unique{d}.py", _gen_file(rng), None, None, False)

    fcols = ["repo", "path", "commit", "lang", "content"]
    lcols = ["repo", "path", "commit", "cluster_id", "transform", "is_original"]
    return Corpus(
        files=pd.DataFrame(files, columns=fcols),
        labels=pd.DataFrame(labels, columns=lcols),
    )
