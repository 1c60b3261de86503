"""PII detection / scrubbing over a text column.

A large-scale training-data pipeline redacts contact details and leaked
credentials before anything else consumes the corpus.  Reference
precedent: the reference redacts its one sensitive field
(``file_location``) from the stored document
(``/root/reference/solrindexer/mmd.py:1087-1098``) — this stage
generalizes that to content-level redaction.

Everything is vectorized: detection counts use
``pyarrow.compute.count_substring_regex`` and redaction uses chained
``replace_substring_regex`` — zero Python per row.  The patterns are
RE2 (pyarrow's regex engine), which is also DuckDB's engine, so the
contract oracle reproduces the scrub byte-for-byte with
``regexp_replace(..., 'g')``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: (name, RE2 pattern, replacement) — applied in order.  Patterns are
#: deliberately conservative for a source-code corpus (a bare digit run
#: is NOT a phone number): emails, IPv4 literals, international-format
#: phone numbers (leading +), and quoted secrets after key-ish names.
PII_PATTERNS = (
    ("email",
     r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4",
     r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    ("phone",
     r"\+[0-9][0-9\- ]{6,}[0-9]",
     "<PHONE>"),
    ("secret",
     r"(?i)(api[_\-]?key|secret|token|passwd|password)\s*[=:]\s*"
     r"['\"][^'\"]{8,}['\"]",
     "\\1=<SECRET>"),
)


class PiiScrubber:
    """Actor-pool stage: per-doc PII counts + the scrubbed text.

    Output columns: ``id_col``, ``n_email``/``n_ipv4``/``n_phone``/
    ``n_secret`` (pre-scrub match counts) and ``text`` (redacted).
    Patterns are module constants (compiled state is inside Arrow's
    kernel cache); construction cost is nil, but the class shape keeps
    the stage uniform with the other stateful stages.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 patterns=PII_PATTERNS):
        self.text_col = text_col
        self.id_col = id_col
        self.patterns = tuple(patterns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.coalesce(batch[self.text_col], pa.scalar("", pa.string()))
        cols = {self.id_col: batch[self.id_col]}
        for name, pat, _repl in self.patterns:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(text, pat), pa.int64()
            )
        scrubbed = text
        for _name, pat, repl in self.patterns:
            scrubbed = pc.replace_substring_regex(scrubbed, pat, repl)
        cols["text"] = scrubbed
        return pa.table(cols)


def scrub_pii(ds, text_col: str = "text", id_col: str = "doc_id"):
    """documents -> (id, per-kind PII counts, scrubbed text).  Streams:
    one vectorized ``map_batches`` stage, no shuffle, no materialization."""
    return ds.map_batches(
        PiiScrubber(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
