"""Query parsing — the subset of Lucene query syntax the reference CLI uses.

Reference: ``searchindex`` passes user queries straight through to Solr
(``/root/reference/solrindexer/search.py:125-140`` build_search_request; the
documented usage is bare free-text over the default ``full_text`` field and
``field:value`` queries, ``/root/reference/README.md:277-302``).

Supported grammar (documented subset):

- bare terms                -> scored (BM25, OR semantics; Lucene default)
- ``term1 AND term2``       -> conjunction (all scoring clauses required)
- ``-term``                 -> prohibited (MUST_NOT)
- ``"exact phrase"``        -> phrase clause (positions required; Lucene
                               PhraseQuery: tf = phrase frequency, idf = sum
                               of the member terms' idfs)
- ``-"exact phrase"``       -> prohibited phrase
- ``field:value`` / ``field:"multi word"`` -> exact metadata filter for
                               ``repo``, ``path``, ``commit``, ``lang``; any
                               other field prefix (e.g. ``full_text:``/
                               ``content:``) analyzes the value as scoring
                               terms (or a phrase when quoted).
- ``pre*``                  -> prefix (wildcard) clause.  Solr/Lucene
                               default rewrite: CONSTANT_SCORE — every doc
                               containing any expansion scores 1.0 for the
                               clause.  ``-pre*`` prohibits; a trailing
                               ``*`` on a filter field (``path:src*``)
                               prefix-matches the metadata value.
- ``*:*`` / ``*``           -> match-all (Solr's canonical match-all query)
- ``field:[lo TO hi]``      -> range filter on the metadata fields or the
                               numeric ``doclen`` field; ``{`` / ``}``
                               bounds are exclusive (Lucene), ``*`` is an
                               open end; ``-field:[...]`` negates.

Only trailing-``*`` prefixes are supported (no leading/infix wildcards, no
fuzzy ``~``); slop (``"a b"~2``) is not supported.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

FILTER_FIELDS = ("repo", "path", "commit", "lang")
DEFAULT_FIELD_ALIASES = ("full_text", "content", "text")

#: quoted segments, optionally negated and/or field-prefixed, with an
#: optional trailing boost:  -field:"some words"  "a phrase"^2.5
_QUOTED = re.compile(r'(-?)(?:([A-Za-z_][\w.]*):)?"([^"]*)"(?:\^([0-9.]+))?')

#: trailing boost on a bare clause: term^2 / pre*^1.5
_BOOST = re.compile(r"^(.*?)\^([0-9]+(?:\.[0-9]+)?)$")

#: range filters: field:[lo TO hi], exclusive {} bounds, * open ends
_RANGE = re.compile(
    r"(-?)([A-Za-z_][\w.]*):([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])"
)

#: fields a range filter may target (metadata strings + token count)
RANGE_FIELDS = (*FILTER_FIELDS, "doclen")


@dataclass(frozen=True)
class RangeFilter:
    field: str
    lo: str | None          # None = open end
    hi: str | None
    lo_incl: bool = True
    hi_incl: bool = True

    def bounds(self):
        """Typed (lo, hi): ints for doclen, raw strings otherwise."""
        if self.field == "doclen":
            return (
                None if self.lo is None else int(self.lo),
                None if self.hi is None else int(self.hi),
            )
        return self.lo, self.hi

    def matches(self, value) -> bool:
        lo, hi = self.bounds()
        if value is None:
            return False
        if lo is not None and (value < lo or (value == lo and not self.lo_incl)):
            return False
        if hi is not None and (value > hi or (value == hi and not self.hi_incl)):
            return False
        return True


@dataclass
class ParsedQuery:
    terms: list = field(default_factory=list)        # analyzed scoring terms
    prohibited: list = field(default_factory=list)   # analyzed MUST_NOT terms
    filters: dict = field(default_factory=dict)      # field -> exact value
    conjunctive: bool = False                        # True when AND was used
    phrases: list = field(default_factory=list)          # list[list[term]]
    prohibited_phrases: list = field(default_factory=list)
    neg_filters: dict = field(default_factory=dict)  # -field:value exclusions
    prefixes: list = field(default_factory=list)         # constant-score pre*
    prohibited_prefixes: list = field(default_factory=list)
    range_filters: list = field(default_factory=list)        # [RangeFilter]
    neg_range_filters: list = field(default_factory=list)
    #: Lucene query-time boosts (term^2, "a b"^3, pre*^1.5); absent = 1.0.
    #: Keys: term string / phrase tuple / prefix string.  Last boost wins
    #: for a repeated clause.
    boosts: dict = field(default_factory=dict)
    phrase_boosts: dict = field(default_factory=dict)
    prefix_boosts: dict = field(default_factory=dict)

    @property
    def is_match_all(self) -> bool:
        return not (
            self.terms or self.filters or self.phrases or self.prefixes
            or self.range_filters
        )


def parse_query(q: str, analyze) -> ParsedQuery:
    """Parse a query string; ``analyze(text) -> list[str]`` pins the analyzer."""
    out = ParsedQuery()

    def eat_quoted(m: re.Match) -> str:
        neg, fld, text = m.group(1) == "-", m.group(2), m.group(3)
        boost = float(m.group(4)) if m.group(4) else None
        if fld in FILTER_FIELDS:
            (out.neg_filters if neg else out.filters)[fld] = text
            return " "
        toks = analyze(text)
        if not toks:
            return " "
        if len(toks) == 1:  # single-term phrase rewrites to a term (Lucene)
            (out.prohibited if neg else out.terms).extend(toks)
            if boost is not None and not neg:
                out.boosts[toks[0]] = boost
        else:
            (out.prohibited_phrases if neg else out.phrases).append(toks)
            if boost is not None and not neg:
                out.phrase_boosts[tuple(toks)] = boost
        return " "

    def eat_range(m: re.Match) -> str:
        neg, fld = m.group(1) == "-", m.group(2)
        if fld not in RANGE_FIELDS:
            raise ValueError(
                f"range filter on unsupported field {fld!r} "
                f"(supported: {', '.join(RANGE_FIELDS)})"
            )
        rf = RangeFilter(
            fld,
            None if m.group(4) == "*" else m.group(4),
            None if m.group(5) == "*" else m.group(5),
            lo_incl=m.group(3) == "[",
            hi_incl=m.group(6) == "]",
        )
        rf.bounds()  # validate numeric bounds eagerly (doclen)
        (out.neg_range_filters if neg else out.range_filters).append(rf)
        return " "

    q = _QUOTED.sub(eat_quoted, q or "")
    q = _RANGE.sub(eat_range, q)
    for raw in q.split():
        if raw == "AND":
            out.conjunctive = True
            continue
        if raw in ("OR", "||"):
            continue
        if raw in ("*", "*:*"):  # Solr match-all
            continue
        neg = raw.startswith("-") and len(raw) > 1
        if neg:
            raw = raw[1:]
        elif raw.startswith("+") and len(raw) > 1:
            raw = raw[1:]  # MUST ~= AND for our OR/AND model
            out.conjunctive = True
        boost = None
        bm = _BOOST.match(raw)
        if bm and bm.group(1):
            raw, boost = bm.group(1), float(bm.group(2))
        if ":" in raw:
            fld, _, val = raw.partition(":")
            val = val.strip('"')
            if fld in FILTER_FIELDS:
                # a trailing * on a filter value prefix-matches the
                # metadata string (engine: starts_with pushdown)
                (out.neg_filters if neg else out.filters)[fld] = val
                continue
            raw = val  # default-field alias or unknown field -> score terms
        if raw.endswith("*") and len(raw) > 1 and "*" not in raw[:-1]:
            pre = analyze(raw[:-1])
            if pre:  # analyzed prefix: last emitted token stem
                (out.prohibited_prefixes if neg else out.prefixes).append(
                    pre[-1]
                )
                if boost is not None and not neg:
                    out.prefix_boosts[pre[-1]] = boost
            continue
        toks = analyze(raw)
        (out.prohibited if neg else out.terms).extend(toks)
        if boost is not None and not neg:
            for t in toks:  # a multi-token raw clause boosts every token
                out.boosts[t] = boost
    return out
