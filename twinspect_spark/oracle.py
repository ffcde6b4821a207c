"""Pure-Python brute-force oracle — the semantic baseline for every Spark
stage, mirroring the reference's practice of keeping the O(n²) LameDuck
engine as ground truth for its fast engines
(twinspect/metrics/hamming.py:1-8,146-149,187-215).

Independent code path: scalar hashing twins from functions/hashing.py
(``*_py``), Python sets, no numpy vectorization, no Spark. Runs on
corpora ≤ a few hundred files.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import pandas as pd

from twinspect_spark.config import DedupConfig
from twinspect_spark.functions import hashing as H


def normalize_simple_py(text: str) -> str:
    return " ".join(text.lower().split())


@dataclass
class OracleResult:
    rows: pd.DataFrame            # file_id, sha256, minhash(list), simhash(int)
    dup_pairs: set[tuple[int, int]]          # exact Jaccard >= threshold, a < b
    exact_pairs: set[tuple[int, int]]        # byte-identical content
    jaccard: dict[tuple[int, int], float] = field(default_factory=dict)
    clusters: dict[int, int] = field(default_factory=dict)  # file_id -> min-id


def _xxhash_free_file_id(repo: str, path: str, commit: str) -> int:
    """Oracle file ids only need to be stable+unique; tests map Spark's
    xxhash64 ids to oracle ids through (repo,path,commit) keys."""
    digest = hashlib.sha256(f"{repo}\x00{path}\x00{commit}".encode()).digest()
    return int.from_bytes(digest[:8], "big", signed=True)


def run_oracle(files: pd.DataFrame, cfg: DedupConfig) -> OracleResult:
    """files(repo, path, commit, lang, content) → brute-force signatures,
    all-pairs exact Jaccard, dup pairs at cfg.jaccard_threshold, and
    min-id connected components (DFS, like the reference Graph,
    ultils.py:60-91)."""
    recs = []
    shingles: dict[int, set[int]] = {}
    content_by_id: dict[int, str] = {}
    for row in files.itertuples(index=False):
        fid = _xxhash_free_file_id(row.repo, row.path, row.commit)
        norm = normalize_simple_py(row.content)
        sh = H.shingle_hashes_py(norm, cfg.shingle_size)
        mh = [H.to_signed64(v) for v in H.minhash_py(sh, cfg.num_perm, cfg.seed)]
        sim = H.to_signed64(H.simhash64_py(sh, cfg.seed))
        sha = hashlib.sha256(row.content.encode()).hexdigest()
        recs.append(
            {
                "repo": row.repo, "path": row.path, "commit": row.commit,
                "file_id": fid, "sha256": sha, "minhash": mh, "simhash": sim,
            }
        )
        shingles[fid] = sh
        content_by_id[fid] = row.content

    rows = pd.DataFrame(recs)
    ids = sorted(shingles)
    dup_pairs: set[tuple[int, int]] = set()
    exact_pairs: set[tuple[int, int]] = set()
    jaccard: dict[tuple[int, int], float] = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(shingles[a] & shingles[b])
            if inter == 0:
                continue
            j = inter / (len(shingles[a]) + len(shingles[b]) - inter)
            jaccard[(a, b)] = j
            if content_by_id[a] == content_by_id[b]:
                exact_pairs.add((a, b))
            if j >= cfg.jaccard_threshold:
                dup_pairs.add((a, b))

    # DFS connected components over dup ∪ exact edges, min-id labels
    adj: dict[int, set[int]] = {i: set() for i in ids}
    for a, b in dup_pairs | exact_pairs:
        adj[a].add(b)
        adj[b].add(a)
    clusters: dict[int, int] = {}
    for start in ids:
        if start in clusters:
            continue
        stack, comp = [start], []
        seen = {start}
        while stack:
            v = stack.pop()
            comp.append(v)
            for u in adj[v]:
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        label = min(comp)
        for v in comp:
            clusters[v] = label

    return OracleResult(rows, dup_pairs, exact_pairs, jaccard, clusters)
