"""Scalar/string/date normalization kernels (SURVEY.md §2.3).

Each function re-expresses one reference utility; citations point at the
behaviour being reproduced (file:line under /root/reference/).  All are
per-value pure functions plus vectorized batch variants where hot.
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------- #
# identifiers
# --------------------------------------------------------------------- #
#: chars replaced in ids (reference IDREPLS, solrindexer/tools.py:51)
IDREPLS = (":", "/", ".")


def to_solr_id(value: str) -> str:
    """Replace ``: / .`` with ``-`` (``solrindexer/tools.py:139-147``)."""
    for ch in IDREPLS:
        value = value.replace(ch, "-")
    return value


def doc_key(repo: str, path: str, commit: str) -> str:
    """Our corpus doc key: normalized ``repo/path@commit`` (F1 analogue)."""
    return to_solr_id(f"{repo}/{path}@{commit}")


def normalize_id_column(col: pa.Array) -> pa.Array:
    """Vectorized ``to_solr_id`` (``pc.replace_substring``)."""
    for ch in IDREPLS:
        col = pc.replace_substring(col, ch, "-")
    return col


#: NPI parent-id fixups (solrindexer/indexer.py:356-384): strip known URL
#: prefixes and a trailing .xml; refs into doi.org are skipped (None).
_NPI_PREFIX = re.compile(r"^https?://(?:data|api)\.npolar\.no/dataset/")


def clean_related_ref(ref: str):
    if "doi.org" in ref:
        return None
    ref = _NPI_PREFIX.sub("", ref)
    if ref.endswith(".xml"):
        ref = ref[: -len(".xml")]
    return ref


# --------------------------------------------------------------------- #
# datetimes
# --------------------------------------------------------------------- #
#: strict Solr format (reference regex, solrindexer/tools.py:53-55)
_STRICT_DT = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$")


def check_date_format(value: str) -> bool:
    """True iff already strict ``YYYY-MM-DDTHH:MM:SSZ``."""
    return bool(_STRICT_DT.match(value or ""))


def parse_date(value):
    """Normalize assorted date strings to strict ``YYYY-MM-DDTHH:MM:SSZ``.

    Reference semantics (``solrindexer/tools.py:150-193``): pass through if
    already strict; else parse (dateutil), normalize to UTC; else strip a
    trailing ``+HH:MM`` offset and retry; ``None`` on failure (suppressed
    errors, never raised).
    """
    if value is None:
        return None
    value = str(value).strip()
    if not value:
        return None
    if check_date_format(value):
        return value
    from dateutil import parser as duparser

    for candidate in (value, re.sub(r"[+-]\d{2}:\d{2}$", "", value)):
        try:
            dt = duparser.parse(candidate)
        except (ValueError, OverflowError):
            continue
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    return None


def parse_iso_datetime(value):
    """ISO parse with ``Z``->``+00:00``, normalized to naive UTC
    (``solrindexer/indexer.py:161-175``)."""
    if not value:
        return None
    try:
        dt = datetime.fromisoformat(str(value).replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def date_range_literal(start, end) -> str:
    """Solr DateRange literal ``[start TO end]`` / ``[start TO *]``
    (``solrindexer/mmd.py:419-421``)."""
    return f"[{start} TO {end if end else '*'}]"


_RANGE = re.compile(r"^\[(.+) TO (.+)\]$")


def parse_date_range_literal(value: str):
    """Inverse: parse ``[a TO b]``; ``*`` -> None (used by the temporal
    order check, ``solrindexer/indexer.py:177-222``)."""
    m = _RANGE.match(value or "")
    if not m:
        return None
    start, end = m.group(1), m.group(2)
    return (None if start == "*" else start, None if end == "*" else end)


# --------------------------------------------------------------------- #
# multivalued fields
# --------------------------------------------------------------------- #
def append_multivalued(existing: list, values) -> list:
    """Order-preserving dedup merge (``solrindexer/mmd.py:208-221`` M22)."""
    seen = set(existing)
    out = list(existing)
    for v in values:
        if v is not None and v not in seen:
            seen.add(v)
            out.append(v)
    return out


def first_string(value):
    """Scalar-or-list -> first non-null string
    (``solrindexer/tools.py:388-401`` F12)."""
    if value is None:
        return None
    if isinstance(value, (list, tuple)):
        for v in value:
            if v is not None:
                return str(v)
        return None
    return str(value)


def set_multilang(entries, base: str) -> dict:
    """Language-keyed fanout (``solrindexer/mmd.py:338-354`` M4).

    ``entries``: [(lang_or_None, text)] -> {base, base_en, base_no, base_hl}
    semantics: no lang / 'en' fills ``base``+``base_en``+``base_hl``;
    other langs fill ``base_<lang>``.
    """
    out = {}
    for lang, text in entries:
        if lang in (None, "", "en"):
            out[base] = text
            out[f"{base}_en"] = text
            out[f"{base}_hl"] = text
        else:
            out[f"{base}_{lang}"] = text
    return out


# --------------------------------------------------------------------- #
# enums / urls
# --------------------------------------------------------------------- #
#: canonical feature types (reference validfeaturetypes, tools.py:58-65)
VALID_FEATURE_TYPES = (
    "point", "timeSeries", "trajectory", "profile", "timeSeriesProfile",
    "trajectoryProfile",
)
_CANON = {v.lower(): v for v in VALID_FEATURE_TYPES}


def canonical_feature_type(value):
    """Case-insensitive map onto the 6 canonical values
    (``solrindexer/tools.py:282-287`` F13); None if invalid."""
    if value is None:
        return None
    return _CANON.get(str(value).strip().lower())


def fix_nersc_url(url: str) -> str:
    """http->https rewrite for one host (``solrindexer/tools.py:222-226``)."""
    return re.sub(r"^http://(thredds\.nersc\.no)", r"https://\1", url or "")


_URL = re.compile(r"^https?://[^\s/$.?#].[^\s]*$")


def check_url(url) -> bool:
    """Syntactic URL validation (``solrindexer/tools.py:208-219`` F14)."""
    return bool(_URL.match(url or ""))


# --------------------------------------------------------------------- #
# misc
# --------------------------------------------------------------------- #
def compact_json(obj) -> str:
    """Compact JSON with nulls stripped (``solrindexer/mmd.py:628-631``)."""

    def strip(o):
        if isinstance(o, dict):
            return {k: strip(v) for k, v in o.items() if v is not None}
        if isinstance(o, list):
            return [strip(v) for v in o]
        return o

    return json.dumps(strip(obj), separators=(",", ":"), sort_keys=True)


_DOI = re.compile(r"10\.\d{4,9}/[-._;()/:A-Za-z0-9]+")


def extract_doi(text):
    """DOI regex search (``solrindexer/mmd.py:1121-1131`` M21)."""
    m = _DOI.search(text or "")
    return m.group(0) if m else None


def clean_warning_message(msg: str) -> str:
    """Strip icon prefixes for summaries (``solrindexer/indexer.py:224-226``)."""
    return re.sub(r"^[\W\s]+", "", msg or "").strip()


def darextract(dar_entries) -> dict:
    """Legacy DAR link-list splitter (``solrindexer/mmd.py:1489-1504``
    F11): each entry is ``proto:url`` (optionally quoted, optionally
    bytes); entries containing ``description`` keep only the part before
    the first comma (the remainder is discarded — reference behavior kept
    verbatim, quirks included: a ``description`` entry WITHOUT a comma
    raises ``ValueError`` from the reference's two-target unpack
    ``t1, t2 = mystr.split(",", 1)``, mirrored here).  Returns
    ``{proto: url}``."""
    links: dict = {}
    for entry in dar_entries or []:
        s = entry.decode("utf-8") if isinstance(entry, bytes) else entry
        if "description" in s:
            s, _rest = s.split(",", 1)
        s = s.replace('"', "")
        proto, url = s.split(":", 1)
        links[proto] = url
    return links
