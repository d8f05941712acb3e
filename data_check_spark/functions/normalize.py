"""Text canonicalization for dedup and matching: Unicode NFC
normalization plus invisible-character stripping. Web text carries
visually-identical strings that hash differently — decomposed accents
(e + U+0301 vs the precomposed letter) and zero-width/soft-hyphen
characters injected by CMSes — which silently defeat exact and
near-dup hashing. Canonicalize BEFORE the dedup hashers (operators/
dedup.py) to collapse them.

Engine parity: stripping is one JVM regexp_replace over a fixed char
class (same class RE2/DuckDB accepts — the oracle re-derives it);
NFC is an Arrow-batched pandas UDF over Python's unicodedata, which
implements the same Unicode normalization as DuckDB's utf8proc-backed
``nfc_normalize`` — the ``text_normalize`` oracle proves the two
agree byte-for-byte on the planted sequences.

The reference has no text canonicalization at all (its
canonicalization is SQL CAST-to-string for row diffs,
data_check/processors/bigquery.py:143-193); this is beyond-reference curation
plumbing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: zero-width space / non-joiner / joiner, soft hyphen, BOM/ZWNBSP.
INVISIBLE_CHARS: tuple[str, ...] = (
    "\u200b",
    "\u200c",
    "\u200d",
    "\u00ad",
    "\ufeff",
)

_INVISIBLE_CLASS = "[" + "".join(INVISIBLE_CHARS) + "]"


def strip_invisible(text: Column) -> Column:
    """Remove zero-width and soft-hyphen characters (JVM regex, one
    pass, no Python worker). NULL propagates."""
    return F.regexp_replace(text, _INVISIBLE_CLASS, "")


@F.pandas_udf("string")
def nfc_normalize(s: pd.Series) -> pd.Series:
    """Unicode NFC normalization, Arrow-batched. The one per-row
    Python step in the text path — unavoidable: Spark has no built-in
    Unicode normalizer — but it pays per Arrow batch, not per row,
    and only dedup-canonicalization needs it."""
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


def canonical_text(text: Column) -> Column:
    """The dedup-canonical form: invisible-stripped then NFC."""
    return nfc_normalize(strip_invisible(text))
