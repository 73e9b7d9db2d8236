"""Row-level parsers for the record-assembly fold (reference P1-P4).

These run only inside the Arrow-batched ``applyInPandas`` island of the
assembly operator — everything batchable (classification, name
decomposition, output projection) is JVM-side Column expressions
elsewhere.  Semantics are pinned, case by case, to the reference:

* P1+P2 name-line parse  — /root/reference/lambda_function.py:258-369
* P3 continuation parse  — /root/reference/lambda_function.py:374-414
* P4 positional merge    — /root/reference/lambda_function.py:419-450

and validated by goldens generated from the reference (tests/).
"""

from __future__ import annotations

import re

from .predicates import DASHES, py_is_numeric_token

N_SLOTS = 5  # improved acres, unimproved acres, cash value, implements, livestock

_WS = re.compile(r"\s+")
_BARE_INT = re.compile(r"^\s*\d+\s*$")
_SMALL_INT = re.compile(r"\b\d{1,6}\b")
_HAS_DIGIT = re.compile(r"\d")


def _clean_digit_string(token: str) -> str:
    """Strip ``,``/``$``; keep only pure digit strings, else the dash
    sentinel (lambda_function.py:321-325)."""
    bare = token.replace(",", "").replace("$", "").strip()
    return bare if bare.isdigit() else "-"


def parse_name_line(text: str) -> tuple[str, list[str]]:
    """P1+P2: split a name line into (name, five positional value slots).

    The name is the comma-parts prefix before the first part that is a
    dash/empty/numeric/digit-bearing part; a part mixing words and
    dashes contributes its leading words to the name.  Values fill the
    five slots positionally, dashes preserved; a lone numeric value is
    re-assigned by the single-value heuristic (comma-count / magnitude,
    lambda_function.py:347-367).
    """
    norm = _WS.sub(" ", text.strip())
    parts = [p.strip() for p in norm.split(",")]

    name_words: list[str] = []
    value_start = None
    for i, part in enumerate(parts):
        if part in DASHES or part == "" or py_is_numeric_token(part) or _HAS_DIGIT.search(part):
            value_start = i
            break
        tokens = part.split()
        cut = next(
            (
                j
                for j, tok in enumerate(tokens)
                if tok in DASHES or py_is_numeric_token(tok) or _HAS_DIGIT.search(tok)
            ),
            None,
        )
        if cut is not None:
            name_words.extend(tokens[:cut])
            value_start = i
            break
        name_words.append(part)

    name = " ".join(name_words).strip()
    slots = ["-"] * N_SLOTS

    if value_start is not None:
        pos = 0
        for part in parts[value_start:]:
            if pos >= N_SLOTS:
                break
            if part in DASHES or part == "":
                slots[pos] = "-"
                pos += 1
            elif py_is_numeric_token(part):
                slots[pos] = _clean_digit_string(part)
                pos += 1
            else:
                for tok in part.split():
                    if pos >= N_SLOTS:
                        break
                    if tok in DASHES:
                        slots[pos] = "-"
                        pos += 1
                    elif py_is_numeric_token(tok):
                        slots[pos] = _clean_digit_string(tok)
                        pos += 1
                    # non-numeric, non-dash tokens are skipped (no slot)

    filled = [v for v in slots if v != "-" and v.isdigit()]
    if len(filled) == 1:
        value = int(filled[0])
        commas = norm.count(",")
        slots = ["-"] * N_SLOTS
        # Single-value heuristic: 1 or >=4 commas => livestock; otherwise
        # >=1000 => cash value; else livestock (lambda_function.py:356-367).
        if commas == 1 or commas >= 4:
            slots[4] = str(value)
        elif value >= 1000:
            slots[2] = str(value)
        else:
            slots[4] = str(value)

    return name, slots


def extract_continuation_values(text: str) -> list[str]:
    """P3: variable-length positional values from a continuation line.

    A bare integer short-circuits to a single value; otherwise each
    comma-part becomes a dash, a cleaned number (decimals survive here,
    unlike P1 — lambda_function.py:400-404), or the first 1-6 digit run
    found in mixed content, else a dash.
    """
    if not text or not text.strip():
        return []
    t = text.strip()
    if _BARE_INT.match(t):
        return [t]

    out: list[str] = []
    for part in (p.strip() for p in t.split(",")):
        if part in DASHES or part == "":
            out.append("-")
        elif py_is_numeric_token(part):
            bare = part.replace(",", "").replace("$", "").strip()
            out.append(bare if bare and bare.replace(".", "").isdigit() else "-")
        else:
            found = _SMALL_INT.search(part)
            out.append(found.group(0) if found else "-")
    return out


def merge_positional(base: list[str], continuation: list[str]) -> list[str]:
    """P4: cursor-merge continuation values into the dash slots of base.

    Walks the five base slots; each *dash* slot consumes one continuation
    value (advancing the cursor even when that value is itself a dash,
    which fills nothing) — filled slots are skipped without consuming.
    This exact cursor semantic is the reference's priority edge case
    (lambda_function.py:437-448).
    """
    if not continuation:
        return base
    merged = (base + ["-"] * N_SLOTS)[:N_SLOTS]
    cursor = 0
    for i in range(N_SLOTS):
        if merged[i] == "-" and cursor < len(continuation):
            value = continuation[cursor]
            if value != "-":
                merged[i] = value
            cursor += 1
    return merged


def make_chunk_udtf():
    """A Python UDTF (Spark 4 table function) for overlapping token
    chunking: one input row fans out to ceil(n/stride) chunk rows.

    The UDTF form exists for the API surface (LATERAL-joinable,
    SQL-registerable, arbitrary Python per row); the codegen
    formulation of the same op (``operators/preprocess.chunk_tokens``)
    is the hot-path default — a UDTF is a row-at-a-time Python
    boundary and should wrap logic Spark expressions cannot state.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk_text string, n_chunk_tokens int")
    class ChunkTokens:
        def eval(self, doc_id: int, text: str, size: int, overlap: int):
            toks = text.split(" ")
            stride = max(size - overlap, 1)
            idx = 0
            pos = 0
            while True:
                chunk = toks[pos : pos + size]
                if not chunk and idx > 0:
                    break
                yield doc_id, idx, " ".join(chunk), len(chunk)
                if pos + size >= len(toks):
                    break
                idx += 1
                pos += stride

    return ChunkTokens
