"""Query parsing — the subset of Lucene query syntax the reference CLI uses.

Reference: ``searchindex`` passes user queries straight through to Solr
(``/root/reference/solrindexer/search.py:125-140`` build_search_request; the
documented usage is bare free-text over the default ``full_text`` field and
``field:value`` queries, ``/root/reference/README.md:277-302``).

Supported grammar (documented subset):

- bare terms                -> scored (BM25, OR semantics; Lucene default)
- ``term1 AND term2``       -> conjunction (all scoring terms required)
- ``-term``                 -> prohibited (MUST_NOT)
- ``field:value``           -> exact metadata filter for ``repo``, ``path``,
                               ``commit``, ``lang``; any other field prefix
                               (e.g. ``full_text:``/``content:``) analyzes
                               the value as scoring terms.

Phrases/positional queries are not supported (the index stores no positions);
this divergence is documented in SURVEY.md §7.3.
"""

from __future__ import annotations

from dataclasses import dataclass, field

FILTER_FIELDS = ("repo", "path", "commit", "lang")
DEFAULT_FIELD_ALIASES = ("full_text", "content", "text")


@dataclass
class ParsedQuery:
    terms: list = field(default_factory=list)        # analyzed scoring terms
    prohibited: list = field(default_factory=list)   # analyzed MUST_NOT terms
    filters: dict = field(default_factory=dict)      # field -> exact value
    conjunctive: bool = False                        # True when AND was used

    @property
    def is_match_all(self) -> bool:
        return not self.terms and not self.filters


def parse_query(q: str, analyze) -> ParsedQuery:
    """Parse a query string; ``analyze(text) -> list[str]`` pins the analyzer."""
    out = ParsedQuery()
    for raw in (q or "").split():
        if raw == "AND":
            out.conjunctive = True
            continue
        if raw in ("OR", "||"):
            continue
        neg = raw.startswith("-") and len(raw) > 1
        if neg:
            raw = raw[1:]
        elif raw.startswith("+") and len(raw) > 1:
            raw = raw[1:]  # MUST ~= AND for our OR/AND model
            out.conjunctive = True
        if ":" in raw:
            fld, _, val = raw.partition(":")
            val = val.strip('"')
            if fld in FILTER_FIELDS:
                out.filters[fld] = val
                continue
            raw = val  # default-field alias or unknown field -> score terms
        toks = analyze(raw)
        (out.prohibited if neg else out.terms).extend(toks)
    return out
