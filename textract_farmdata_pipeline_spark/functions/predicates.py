"""Line classifiers (reference operators F4-F7) as Catalyst expressions.

Each classifier exists twice:

* ``*_col`` — a :class:`pyspark.sql.Column` expression built only from
  JVM-side built-ins (``rlike`` / ``regexp_replace`` / ``length``), so the
  hot classification path stays inside whole-stage codegen and never
  crosses into Python.
* ``py_*`` — a plain-Python twin with byte-identical semantics, used
  inside the pandas-UDF record-assembly island and by unit goldens.

Semantics are pinned to the reference:

* F4 header filter        — /root/reference/lambda_function.py:136-156
* F5 numeric-token test   — /root/reference/lambda_function.py:161-172
* F6 name-start test      — /root/reference/lambda_function.py:177-218
* F7 continuation test    — /root/reference/lambda_function.py:223-253

F6 note: the reference scans tokens of the pre-comma head, skipping
leading junk tokens (only ``_``/``-``), then either matches
initial/proper-name patterns (which all require an ASCII-uppercase first
letter) or falls back to "first char of the first non-junk token is
uppercase (Unicode) AND that token contains an ASCII letter"
(lambda_function.py:212, 216).  Every accepting path therefore reduces
to: *the first non-junk whitespace token of the head starts with an
uppercase letter and contains ``[A-Za-z]``* — one anchored regex
(lookahead-free for RE2), verified against goldens generated from the
reference.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stop-phrases of the reference header filter (lambda_function.py:143-153).
HEADER_PHRASES: tuple[str, ...] = (
    "wayne county",
    "west virginia",
    "agricultural census",
    "1860",
    "name of owner",
    "acres of improved",
    "acres of unimproved",
    "cash value",
    "value of farming",
    "value of livestock",
    "columns 1, 2, 3",
    "university of north carolina",
    "some parts of this county",
    "the university of",
    "filmed the 1860",
    "represent the following",
    "pages were filmed out of sequence",
    "they were transcribed in the order",
    "in which they were filmed",
    "fayette county",
    "floyd county virginia",
    "hardy county",
)

# Dash variants the reference treats as the NULL sentinel
# (lambda_function.py:164-166): ASCII hyphen, em dash, en dash.
DASHES = ("-", "—", "–")
_DASH_CLASS = r"\-—–"

_HEADER_RE = "|".join(re.escape(p) for p in HEADER_PHRASES)
# Exported for DuckDB oracle SQL (same pattern, RE2-compatible).
HEADER_REGEX = _HEADER_RE

# F6 as one anchored regex over the trimmed pre-comma head: optional
# runs of junk tokens (only _/-) then an uppercase first letter.
# \p{Lu} (not [A-Z]) because the reference's fallback uses Python
# ``str.isupper()``, which accepts Unicode uppercase; Java regex and
# DuckDB's RE2 agree on the Lu category.  The reference's fallback
# additionally requires an ASCII letter somewhere in the first token
# (lambda_function.py:216) — RE2 has no lookahead, so encode it as an
# alternation: ASCII-uppercase first char, or Unicode-uppercase first
# char with an ASCII letter later in the same token (\S cannot cross
# the token's trailing whitespace).
_NAME_START_RE = r"^([_\-]+\s+)*([A-Z]|\p{Lu}\S*[A-Za-z])"
NAME_START_REGEX = _NAME_START_RE


def _head(text: Column) -> Column:
    return F.trim(F.split_part(text, F.lit(","), F.lit(1)))


def is_blank_col(text: Column) -> Column:
    """F3: stripped text is empty (lambda_function.py:101-102, 581-583)."""
    return F.trim(F.coalesce(text, F.lit(""))) == ""


def is_header_text_col(text: Column) -> Column:
    """F4: lowercase text contains any stop-phrase."""
    return F.coalesce(F.lower(text).rlike(_HEADER_RE), F.lit(False))


def is_numeric_token_col(token: Column) -> Column:
    """F5: dash sentinel, or digits(.digits) after stripping ``,$-``,
    or a ``$``-prefixed comma-grouped number after dropping ``-``."""
    t = F.coalesce(token, F.lit(""))
    dash = F.trim(t).rlike(rf"^[{_DASH_CLASS}]$")
    bare = F.trim(F.regexp_replace(t, r"[,$\-]", ""))
    plain = bare.rlike(r"^\d+(\.\d+)?$")
    money = F.regexp_replace(t, r"-", "").rlike(r"^\$?\d[\d,]*(\.\d+)?$")
    return dash | plain | money


def starts_with_name_col(text: Column) -> Column:
    """F6: head (pre-comma, trimmed) starts with junk-token runs then
    an uppercase letter.  See module docstring for the reduction proof."""
    return F.coalesce(_head(F.coalesce(text, F.lit(""))).rlike(_NAME_START_RE), F.lit(False))


def is_continuation_line_col(text: Column) -> Column:
    """F7: non-blank, not a name line, and either (a) at most one char
    remains after deleting digits and ``[,\\s-—–$.]`` or (b) at most two
    alphabetic chars total."""
    t = F.trim(F.coalesce(text, F.lit("")))
    residue = F.length(
        F.regexp_replace(F.regexp_replace(t, r"\d+", ""), rf"[,\s{_DASH_CLASS}$.]", "")
    )
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]+", ""))
    # starts_with_name_col is trim-invariant (its head is trimmed after
    # the comma split), so pass the raw text: the name-RLIKE subtree is
    # then bit-identical to the is_name projection's and whole-stage
    # codegen's subexpression elimination evaluates the regex once per
    # row instead of twice
    return (t != "") & ~starts_with_name_col(text) & ((residue <= 1) | (alpha <= 2))


# ---------------------------------------------------------------------------
# Python twins (used inside the applyInPandas fold and unit tests).
# ---------------------------------------------------------------------------

_PLAIN_NUM = re.compile(r"\d+(\.\d+)?")
_MONEY_NUM = re.compile(r"\$?\d[\d,]*(\.\d+)?")
# Python re lacks \p{Lu}; skip the junk-token prefix, then test the next
# char with str.isupper() — the reference's own uppercase notion.
_JUNK_PREFIX = re.compile(r"^([_\-]+\s+)*")
_HEADER = re.compile(_HEADER_RE)


def py_is_header_text(text: str) -> bool:
    return bool(text) and _HEADER.search(text.lower()) is not None


def py_is_numeric_token(token: str) -> bool:
    if not token:
        return False
    if token.strip() in DASHES:
        return True
    bare = token.replace(",", "").replace("$", "").replace("-", "").strip()
    if _PLAIN_NUM.fullmatch(bare):
        return True
    return _MONEY_NUM.fullmatch(token.replace("-", "")) is not None


def py_starts_with_name(text: str) -> bool:
    if not text:
        return False
    head = text.split(",", 1)[0].strip()
    rest = head[_JUNK_PREFIX.match(head).end() :]
    if not rest or not rest[0].isupper():
        return False
    # Reference fallback also demands an ASCII letter in the first
    # token (lambda_function.py:216): "ÉÀ" is not a name head.
    first_token = rest.split(None, 1)[0]
    return re.search(r"[A-Za-z]", first_token) is not None


def py_is_continuation_line(text: str) -> bool:
    if not text or not text.strip():
        return False
    t = text.strip()
    if py_starts_with_name(t):
        return False
    residue = re.sub(rf"[,\s{_DASH_CLASS}$.]", "", re.sub(r"\d+", "", t))
    if len(residue) <= 1:
        return True
    return len(re.sub(r"[^A-Za-z]+", "", t)) <= 2
