"""Deterministic synthetic source-code corpus (BASELINE.json ``input_hint``).

Schema: ``repo:string, path:string, commit:string, lang:string,
content:string`` — one row per source file at one commit.  Fully seeded: the
same (n_files, seed) always produces byte-identical content, so tests and
benchmarks are reproducible with no external data (FIXTURES.md §1).

Properties engineered in:

- Zipfian repo sizes  -> partition skew for the skew-handling tests.
- Zipfian token draw  -> stop-word-heavy terms (df ~ N) for salting tests.
- camelCase / snake_case identifiers -> code-analyzer sub-token tests.
- log-normal content lengths, plus a few near-empty and very large rows.
- edge rows (negative corpus): empty content, whitespace-only, token-free
  punctuation, duplicate (repo, path) at different commit, exact duplicate
  full row (reference analogue: ``tests/input-files/fail/`` corpus).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "java", "go", "javascript", "c", "markdown", "text"]
EXT = {
    "python": "py", "java": "java", "go": "go", "javascript": "js",
    "c": "c", "markdown": "md", "text": "txt",
}

_KEYWORDS = {
    "python": ["def", "class", "import", "return", "self", "for", "in", "if",
               "else", "None", "True", "lambda", "yield", "with", "try"],
    "java": ["public", "class", "static", "void", "final", "return", "new",
             "private", "extends", "implements", "throws", "int", "String"],
    "go": ["func", "package", "import", "return", "defer", "go", "chan",
           "struct", "interface", "range", "select", "var", "type"],
    "javascript": ["function", "const", "let", "var", "return", "async",
                   "await", "export", "import", "class", "this", "new"],
    "c": ["int", "char", "void", "return", "struct", "static", "const",
          "sizeof", "typedef", "union", "while", "for", "if"],
    "markdown": ["the", "a", "and", "of", "to", "in", "is", "for", "with",
                 "this", "usage", "install", "example", "see", "docs"],
    "text": ["the", "a", "and", "of", "to", "in", "is", "that", "it",
             "was", "on", "as", "are", "be", "this"],
}

_IDENT_STEMS = ["parse", "read", "write", "index", "query", "merge", "token",
                "batch", "score", "doc", "term", "block", "buffer", "stream",
                "shard", "hash", "cache", "node", "field", "value", "config",
                "worker", "table", "row", "group", "split", "count", "load"]


def _identifiers(rng: np.random.Generator, n: int) -> list:
    """Deterministic pool of snake_case and camelCase identifiers."""
    out = []
    for _ in range(n):
        parts = [
            _IDENT_STEMS[int(rng.integers(len(_IDENT_STEMS)))]
            for _ in range(int(rng.integers(2, 4)))
        ]
        if rng.random() < 0.5:
            out.append("_".join(parts))
        else:
            out.append(parts[0] + "".join(p.capitalize() for p in parts[1:]))
    return out


def generate_corpus(
    n_files: int,
    seed: int = 42,
    mean_tokens: int = 120,
    with_edge_rows: bool = True,
) -> pa.Table:
    """Build the corpus table deterministically in memory."""
    rng = np.random.default_rng(seed)

    n_repos = max(2, int(np.sqrt(n_files) / 2))
    repo_names = [f"org{i % 7}/proj{i}" for i in range(n_repos)]
    # Zipfian repo popularity -> skewed partition sizes
    repo_w = 1.0 / np.arange(1, n_repos + 1) ** 1.1
    repo_w /= repo_w.sum()
    repo_idx = rng.choice(n_repos, size=n_files, p=repo_w)

    lang_idx = rng.integers(0, len(LANGS), size=n_files)

    # per-lang token vocabulary: keywords (hot, Zipf head) + identifiers
    ident_pool = _identifiers(rng, 400)
    vocabs = {}
    for lang in LANGS:
        vocab = np.array(_KEYWORDS[lang] + ident_pool)
        w = 1.0 / np.arange(1, len(vocab) + 1) ** 1.05
        vocabs[lang] = (vocab, w / w.sum())

    lengths = np.maximum(
        1, rng.lognormal(np.log(mean_tokens), 0.6, size=n_files)
    ).astype(np.int64)
    # a few very large rows (tokenizer/block-size stress)
    big = rng.choice(n_files, size=max(1, n_files // 500), replace=False)
    lengths[big] = lengths[big] * 50

    repos, paths, commits, langs, contents = [], [], [], [], []
    per_repo_counter = dict.fromkeys(range(n_repos), 0)
    for i in range(n_files):
        r = int(repo_idx[i])
        lang = LANGS[int(lang_idx[i])]
        k = per_repo_counter[r]
        per_repo_counter[r] = k + 1
        path = f"src/mod{k % 13}/file_{k}.{EXT[lang]}"
        repo = repo_names[r]
        commit = hashlib.sha1(f"{seed}:{repo}:{path}".encode()).hexdigest()
        vocab, w = vocabs[lang]
        toks = vocab[rng.choice(len(vocab), size=int(lengths[i]), p=w)]
        contents.append(" ".join(toks.tolist()))
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)

    if with_edge_rows and n_files >= 4:
        edge = [
            ("org0/proj0", "src/empty.py", "python", ""),
            ("org0/proj0", "src/blank.txt", "text", "   \n\t  "),
            ("org0/proj0", "src/punct.c", "c", "!!! ??? ;;; ---"),
            # duplicate (repo, path) at a different commit (upsert path)
            (repos[0], paths[0], langs[0], contents[0] + " updated_token"),
        ]
        for repo, path, lang, content in edge:
            repos.append(repo)
            paths.append(path)
            langs.append(lang)
            contents.append(content)
            commits.append(
                hashlib.sha1(f"{seed}:edge:{repo}:{path}:{content}".encode()).hexdigest()
            )
        # exact duplicate of a full row (exact-dedup path)
        for col in (repos, paths, commits, langs, contents):
            col.append(col[1])

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def write_corpus(
    out_path: str,
    n_files: int,
    seed: int = 42,
    row_group_size: int = 8192,
    **kw,
) -> str:
    """Materialize a corpus parquet file; returns the path."""
    table = generate_corpus(n_files, seed=seed, **kw)
    pq.write_table(table, out_path, row_group_size=row_group_size)
    return out_path


def documents_to_corpus_table(documents: pa.Table) -> pa.Table:
    """Map the driver testdata ``documents`` table onto the corpus schema.

    FIXTURES.md §4 mapping: text->content, lang->lang, source->repo,
    doc_id->path; commit is a deterministic hash of the row key.
    ``mtime`` is a deterministic synthetic modified-time —
    ``2024-01-01T00:00:00Z + doc_id hours`` — so date-typed range queries
    have a timestamp stored column a SQL oracle can recompute.
    ``lat``/``lon``/``bbox`` are deterministic synthetic geo columns
    (integer-modular grids over doc_id, bbox = the ±5° ENVELOPE around
    the point with latitude clipping and longitude dateline wrap) so
    spatial filters have stored columns a SQL oracle can recompute.
    """
    from datetime import datetime, timedelta

    doc_ids = documents["doc_id"].to_pylist()
    sources = documents["source"].to_pylist()
    commits = [
        hashlib.sha1(f"{s}:{d}".encode()).hexdigest()
        for s, d in zip(sources, doc_ids)
    ]
    base = datetime(2024, 1, 1)
    mtimes = [base + timedelta(hours=int(d)) for d in doc_ids]
    lat = [((int(d) * 37) % 1700) / 10.0 - 85.0 for d in doc_ids]
    lon = [((int(d) * 73) % 3600) / 10.0 - 180.0 for d in doc_ids]

    def wrap(x: float) -> float:
        return ((x + 540.0) % 360.0) - 180.0

    bbox = [
        f"ENVELOPE({wrap(lo - 5)}, {wrap(lo + 5)}, "
        f"{min(la + 5.0, 90.0)}, {max(la - 5.0, -90.0)})"
        for la, lo in zip(lat, lon)
    ]
    return pa.table(
        {
            "repo": documents["source"],
            "path": pa.array([f"doc_{d}.txt" for d in doc_ids], pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": documents["lang"],
            "content": documents["text"],
            "mtime": pa.array(mtimes, pa.timestamp("us")),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
            "bbox": pa.array(bbox, pa.string()),
        }
    )
