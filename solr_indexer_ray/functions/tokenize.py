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


# --------------------------------------------------------------------- #
# vectorized whole-unit tokenization (Arrow RE2 kernels, no per-token
# Python) — the build-side hot path.  Per-row analyzers above stay the
# reference implementation (query parse, oracle, phrase eval); equality
# is pinned by tests/test_tokenize.py property tests.
# --------------------------------------------------------------------- #

#: RE2 pre-passes that turn ``code_analyzer`` into "lower + split on
#: non-alnum" applied to the whole text at once:
#:   1. a token-INITIAL digit run followed by a letter/_ splits
#:      (findall's ``[0-9]+`` alternative; mid-identifier digits don't)
#:   2-3. camel boundaries (ALLCapsWord, lowerUpper) — identical to the
#:      per-identifier ``_expand_identifier`` regexes; safe globally
#:      because both patterns require adjacency, which never spans a
#:      separator
_CODE_PREPASS = (
    (r"(^|[^A-Za-z0-9_])([0-9]+)([A-Za-z_])", r"\1\2 \3"),
    (r"([A-Z]+)([A-Z][a-z])", r"\1 \2"),
    (r"([a-z0-9])([A-Z])", r"\1 \2"),
)


def _tokenize_block_bytes(texts, analyzer_name: str):
    """ASCII fast path: the whole block tokenizes as vectorized numpy
    passes over the raw utf-8 buffer — boundary masks (camel splits,
    token-initial digit runs, separators) computed on shifted byte-class
    arrays, token bytes gathered once, then ONE Arrow dictionary_encode.
    No per-token Python objects anywhere.  Byte-exact with the per-row
    analyzers for ASCII input (property-tested); returns None when the
    block contains non-ASCII bytes (caller falls back to the RE2 path,
    whose unicode lowering matches the python implementations).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    if pa.types.is_large_string(texts.type):
        texts = texts.cast(pa.string())
    buffers = texts.buffers()
    offs = np.frombuffer(buffers[1], dtype=np.int32)[
        texts.offset:texts.offset + len(texts) + 1
    ].astype(np.int64)
    raw = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] else (
        np.empty(0, np.uint8)
    )
    buf = raw[offs[0]:offs[-1]]
    offs = offs - offs[0]
    if buf.size and int(buf.max()) >= 128:
        return None  # unicode: RE2 path handles case mapping
    nrows = len(texts)
    total = int(buf.size)
    if total == 0:
        return np.empty(0, np.int64), np.zeros(nrows, np.int64), []

    # row boundaries as flag arrays (no padded copy): tokens never span
    # rows because ``start`` is forced at row starts, and the lookahead
    # rules are suppressed at row-last positions
    is_row_start = np.zeros(total, dtype=bool)
    is_row_start[offs[:-1][offs[:-1] < total]] = True
    is_row_start[0] = True

    is_up = (buf >= 65) & (buf <= 90)
    is_lo = (buf >= 97) & (buf <= 122)
    is_dig = (buf >= 48) & (buf <= 57)
    lowered = np.where(is_up, buf | 0x20, buf)

    if analyzer_name == "code":
        is_us = buf == 95
        word = is_up | is_lo | is_dig | is_us
        tokchar = is_up | is_lo | is_dig  # '_' separates after extraction
        # camel1: lower/digit followed by upper
        split = np.zeros(total, dtype=bool)
        split[1:] = is_up[1:] & (is_lo[:-1] | is_dig[:-1])
        # camel2: UPPER+ then UPPER lower -> boundary before the last
        # UPPER; the i+1 lookahead must not cross into the next row
        c2 = np.zeros(total, dtype=bool)
        c2[1:-1] = (
            is_up[1:-1] & is_lo[2:] & is_up[:-2] & ~is_row_start[2:]
        )
        split |= c2
        # token-initial digit run followed by letter/_ (findall's [0-9]+
        # alternative): O(#digit-runs) — run starts/ends via adjacent
        # flags, "token-initial" read at each run's start only
        d_start = is_dig.copy()
        d_start[1:] = is_dig[1:] & (~is_dig[:-1] | is_row_start[1:])
        d_end = is_dig.copy()
        d_end[:-1] = is_dig[:-1] & (~is_dig[1:] | is_row_start[1:])
        S = np.flatnonzero(d_start)
        if S.size:
            E = np.flatnonzero(d_end)
            initial = is_row_start[S] | ~word[np.maximum(S - 1, 0)]
            after = E + 1  # candidate split position after each run
            ok = (
                initial
                & (after < total)
            )
            after = after[ok]
            ok2 = (
                ~is_row_start[after]
                & (is_up[after] | is_lo[after] | is_us[after])
            )
            split[after[ok2]] = True
    else:
        tokchar = is_lo | is_dig | is_up  # upper lowers to a-z
        split = np.zeros(total, dtype=bool)

    start = tokchar & (split | is_row_start)
    start[1:] |= tokchar[1:] & ~tokchar[:-1]
    tok_starts = np.flatnonzero(start)
    if tok_starts.size == 0:
        return np.empty(0, np.int64), np.zeros(nrows, np.int64), []
    end_flag = tokchar.copy()
    end_flag[:-1] = tokchar[:-1] & (
        ~tokchar[1:] | start[1:]
    )
    tok_ends = np.flatnonzero(end_flag)
    tok_lens = tok_ends - tok_starts + 1

    # gather token bytes: token spans are non-overlapping, ascending, and
    # tile the ``tokchar`` positions exactly (splits only cut runs, they
    # never drop bytes), so the concatenated token bytes are ONE boolean
    # compress — no nvals-sized fancy-index array (which cost 8 bytes of
    # index per payload byte and dominated this kernel's wall time)
    ntok = int(tok_starts.size)
    vals = lowered[tokchar]
    off32 = np.zeros(ntok + 1, dtype=np.int32)
    np.cumsum(tok_lens, out=off32[1:])
    sa = pa.StringArray.from_buffers(
        ntok,
        pa.py_buffer(off32.tobytes()),
        pa.py_buffer(vals.tobytes()),
    )
    enc = sa.dictionary_encode()
    tids = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    terms = enc.dictionary.to_pylist()
    # doclens: row of each token via its start position
    row_of = np.searchsorted(offs, tok_starts, side="right") - 1
    doclens = np.bincount(row_of, minlength=nrows).astype(np.int64)
    return tids, doclens, terms


def _tokenize_block_arrow(texts, analyzer_name: str):
    """One analyzer over a block of texts -> (flat token ids int64,
    per-row token counts int64, vocab terms in first-appearance order).

    Everything runs in Arrow C++ (RE2 replaces, utf8_lower, regex split,
    dictionary encode): zero per-token Python objects.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    fast = _tokenize_block_bytes(texts, analyzer_name)
    if fast is not None:
        return fast
    arr = pc.fill_null(texts, "")
    if analyzer_name == "code":
        for pat, repl in _CODE_PREPASS:
            arr = pc.replace_substring_regex(
                arr, pattern=pat, replacement=repl
            )
    arr = pc.utf8_lower(arr)
    lists = pc.split_pattern_regex(arr, pattern="[^a-z0-9]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    # split() emits '' at run boundaries; drop them and re-count per row
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    csum = np.concatenate(([0], np.cumsum(keep, dtype=np.int64)))
    doclens = csum[offsets[1:]] - csum[offsets[:-1]]
    kept = flat.filter(pa.array(keep))
    enc = kept.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    tids = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    terms = enc.dictionary.to_pylist()
    return tids, doclens, terms


def tokenize_unit(texts, langs, registry: AnalyzerRegistry):
    """Vectorized whole-unit tokenization honoring per-lang analyzer
    routing -> (flat token ids in ROW order, per-row doclens, unified
    vocab list).  Rows route to per-analyzer Arrow blocks; unknown
    (plugin) analyzers fall back to the per-row Python path for just
    their rows.  Vocab ids are unified across blocks (first-appearance
    order over block results — deterministic)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    names = [registry.analyzer_name(lang) for lang in langs]
    builtin = {"simple", "code"}
    distinct = set(names)

    if distinct <= builtin and len(distinct) == 1:
        return _tokenize_block_arrow(texts, names[0])

    # group rows per analyzer; run Arrow blocks for builtins, python for
    # plugins; then unify vocabs and stitch back into row order
    vocab: dict = {}
    row_tids: list = [None] * n
    doclens = np.zeros(n, dtype=np.int64)
    for name in sorted(distinct):
        rows = np.flatnonzero(np.asarray([x == name for x in names]))
        if name in builtin:
            sub = texts.take(pa.array(rows))
            tids, lens, terms = _tokenize_block_arrow(sub, name)
            remap = np.empty(max(len(terms), 1), dtype=np.int64)
            for i, t in enumerate(terms):
                v = vocab.get(t)
                if v is None:
                    vocab[t] = v = len(vocab)
                remap[i] = v
            mapped = remap[tids] if tids.size else tids
            off = np.concatenate(([0], np.cumsum(lens)))
            for j, r in enumerate(rows):
                row_tids[r] = mapped[off[j]:off[j + 1]]
                doclens[r] = lens[j]
        else:
            analyze = registry.ANALYZERS[name]
            vget = vocab.get
            for r in rows:
                toks = analyze(texts[int(r)].as_py() or "")
                ids = np.empty(len(toks), dtype=np.int64)
                for k, t in enumerate(toks):
                    v = vget(t)
                    if v is None:
                        vocab[t] = v = len(vocab)
                    ids[k] = v
                row_tids[r] = ids
                doclens[r] = len(toks)
    flat = (
        np.concatenate(row_tids) if n else np.empty(0, np.int64)
    )
    return flat, doclens, list(vocab)
