"""Synthetic source-code repo table (FIXTURES.md F1) + sha256 invariant column.

The engine's native ingest input per BASELINE.json input_hint:
(repo: string, path: string, commit: string, lang: string, content: string).
Deterministic (seed=42), generated with NumPy — the companion
``content_sha256`` column is computed in plain Python at generation time and
the engine's vectorized pandas UDF (functions/hashing.py) must reproduce it
per row (the per-row invariant vs the reference data).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["py", "cpp", "java", "go"]
LANG_W = [0.5, 0.2, 0.2, 0.1]


def _det_text(seed: int, n_words: int = 12) -> str:
    rng = np.random.default_rng(seed % (2**32))
    words = rng.integers(0, 9999, size=n_words)
    return " ".join(f"w{w:04d}" for w in words)


def repos_pandas(n_repos: int = 200, seed: int = 42) -> pd.DataFrame:
    """F1 generator: shared commit ids across repos create co-change edges."""
    rng = np.random.default_rng(seed)
    commit_pool = [
        hashlib.sha256(f"c{k}".encode()).hexdigest()[:12] for k in range(n_repos * 2)
    ]
    rows = []
    # files-per-repo ~ Zipf(a=2.0) clipped [1, 50]
    files_per_repo = np.clip(rng.zipf(2.0, size=n_repos), 1, 50)
    for i in range(n_repos):
        repo = f"repo{i:05d}"
        for j in range(int(files_per_repo[i])):
            path = f"src/f{j}.py"
            n_commits = int(rng.integers(1, 4))
            commits = rng.choice(len(commit_pool), size=n_commits, replace=False)
            for c in commits:
                commit = commit_pool[int(c)]
                lang = LANGS[int(rng.choice(4, p=LANG_W))]
                h = int.from_bytes(
                    hashlib.sha256(f"{repo}/{path}".encode()).digest()[:4], "big"
                )
                content = f"// {repo}/{path}@{commit}\n" + _det_text(seed ^ h)
                rows.append((repo, path, commit, lang, content))
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    pdf["content_sha256"] = [
        hashlib.sha256(c.encode("utf-8")).hexdigest() for c in pdf["content"]
    ]
    return pdf


def make_repos_df(spark, n_repos: int = 200, seed: int = 42):
    return spark.createDataFrame(repos_pandas(n_repos=n_repos, seed=seed))
