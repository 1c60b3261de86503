"""Analyzers: pinned tokenization shared by the index build, the query
engine, the brute-force BM25 oracle, and (for the simple analyzer) the
DuckDB oracle SQL.

Reference analogue: the Solr core's analysis chain is external configuration
(``/root/reference/README.md:25`` points at metno/metsis-solr-configsets);
the reference's own in-repo tokenizer precedent is the Sentinel product-title
splitter (``solrindexer/mmd.py:1100-1119``).  Our engine owns the analyzer,
and pins it per ``lang`` via a registry (the extension-surface pattern of the
reference's vocabulary-backend factory, ``solrindexer/vocabulary.py:447-504``).

Two analyzers:

- ``simple``  : ``lower(text)`` split on ``[^a-z0-9]+``.  Exactly mirrors
  DuckDB ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` so driver-side
  SQL oracles can reproduce it verbatim.
- ``code``    : code-aware — extracts identifier/number tokens, splits
  snake_case and camelCase identifiers into sub-tokens, lowercases.  Used
  for programming-language rows of the corpus (BASELINE.json north_star:
  "code-aware tokenization per lang").
"""

from __future__ import annotations

import re
from typing import Callable

Analyzer = Callable[[str], list]

_SIMPLE_SPLIT = re.compile(r"[^a-z0-9]+")

# identifier-ish or number tokens
_CODE_TOKEN = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+")
# boundary between a lower/digit and an upper char: camelCase -> camel Case;
# also splits ALLCaps runs like "HTTPServer" -> "HTTP Server"
_CAMEL_1 = re.compile(r"([a-z0-9])([A-Z])")
_CAMEL_2 = re.compile(r"([A-Z]+)([A-Z][a-z])")


def simple_analyzer(text: str) -> list:
    """Lowercase alnum-run tokenizer (SQL-reproducible)."""
    if not text:
        return []
    toks = _SIMPLE_SPLIT.split(text.lower())
    # split() yields '' at the boundaries; filter them
    return [t for t in toks if t]


#: memoized raw token -> sub-token tuple (including the trivial no-split
#: case).  Identifier vocabularies are small and Zipfian in real code, so
#: the cache hit rate is high and the camel/snake regex work runs once per
#: distinct token per worker.  Bounded: cleared wholesale past the cap.
_EXPAND_CACHE: dict = {}
_EXPAND_CACHE_CAP = 200_000


def _expand_identifier(tok: str) -> list:
    """Camel/snake split of one identifier (uncached pure helper)."""
    split = _CAMEL_2.sub(r"\1 \2", tok)
    split = _CAMEL_1.sub(r"\1 \2", split)
    return [p.lower() for p in split.replace("_", " ").split()]


def code_analyzer(text: str) -> list:
    """Code-aware tokenizer: identifier extraction + camel/snake splitting.

    Every distinct raw token memoizes its expansion (including the
    no-split lowercase case) — identifier vocabularies are Zipfian, so the
    per-token work is one dict hit on the hot path."""
    if not text:
        return []
    out: list = []
    ext = out.extend
    cget = _EXPAND_CACHE.get
    for tok in _CODE_TOKEN.findall(text):
        v = cget(tok)
        if v is None:
            if "_" in tok or not tok.islower():
                v = tuple(_expand_identifier(tok))
            else:
                v = (tok,)
            if len(_EXPAND_CACHE) >= _EXPAND_CACHE_CAP:
                _EXPAND_CACHE.clear()
            _EXPAND_CACHE[tok] = v
        ext(v)
    return out


#: langs treated as source code by default (FIXTURES.md corpus langs)
CODE_LANGS = frozenset(
    {"python", "java", "go", "javascript", "c", "cpp", "rust", "typescript"}
)


class AnalyzerRegistry:
    """lang -> analyzer resolution, pinned at index-build time.

    Mirrors the reference's string-keyed backend factory pattern
    (``solrindexer/vocabulary.py:447-504``).  Instances are cheap and
    picklable (state = a dict of names), so they ship cleanly into Ray
    actors; the compiled regexes are module-level.
    """

    ANALYZERS: dict = {"simple": simple_analyzer, "code": code_analyzer}

    def __init__(self, default: str = "simple", overrides: dict | None = None):
        if default not in self.ANALYZERS:
            raise KeyError(f"unknown analyzer {default!r}")
        self.default = default
        self.lang_map = {lang: "code" for lang in CODE_LANGS}
        if overrides:
            self.lang_map.update(overrides)

    def analyzer_name(self, lang) -> str:
        if lang is None:
            return self.default
        return self.lang_map.get(lang, self.default)

    def analyzer_for(self, lang) -> Analyzer:
        return self.ANALYZERS[self.analyzer_name(lang)]

    def tokenize(self, text: str, lang=None) -> list:
        return self.analyzer_for(lang)(text)


def register_analyzer(name: str, fn: Analyzer) -> None:
    """User-extension hook (reference analogue: vocabulary backend plugin)."""
    AnalyzerRegistry.ANALYZERS[name] = fn
