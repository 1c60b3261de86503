"""Solr-format synonyms.txt parsing (query-time synonym maps).

Reference format (Solr SynonymGraphFilterFactory):

- ``a, b, c``        -> an equivalence class: each member expands to the
                        others (bidirectional)
- ``a, b => x, y``   -> explicit mapping: the left-hand terms expand to
                        the right-hand terms (directional)
- ``#`` comments and blank lines ignored; terms are run through the
  provided analyzer so the map is expressed in index-term space.
"""

from __future__ import annotations


def parse_synonyms(text: str, analyze) -> dict:
    """Parse Solr synonyms.txt content -> {term: [alternates]}."""
    out: dict = {}

    def add(src: str, dsts) -> None:
        cur = out.setdefault(src, [])
        for d in dsts:
            if d != src and d not in cur:
                cur.append(d)

    def norm(raw: str) -> list:
        toks = analyze(raw.strip())
        return [toks[0]] if toks else []

    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            sources = [t for p in lhs.split(",") for t in norm(p)]
            targets = [t for p in rhs.split(",") for t in norm(p)]
            for s in sources:
                add(s, targets)
        else:
            group = [t for p in line.split(",") for t in norm(p)]
            for s in group:
                add(s, [g for g in group if g != s])
    return {k: sorted(set(v)) for k, v in out.items() if v}


def load_synonyms(path: str, analyze) -> dict:
    with open(path, encoding="utf-8") as f:
        return parse_synonyms(f.read(), analyze)
