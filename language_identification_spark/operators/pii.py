"""PII pseudonymization + checksum-validated IBAN scrubbing.

Extends the flat-mask scrub chain (operators/scrub.py, reference
cleanup.ipynb cells 4,7,12) with the two behaviors a production redaction
stage adds on top of `X -> <TOKEN>` masking:

- **Consistent per-document pseudonymization** (``pseudonymize_expr``):
  every occurrence of the same email/phone inside one document maps to the
  same indexed placeholder (``<EMAIL_0>``, ``<EMAIL_1>``, ...), so
  coreference survives redaction ("reply to <EMAIL_0>" still reads after
  the address is gone). Index = rank of the match in the SORTED distinct
  match list — a deterministic, engine-portable contract (first-occurrence
  order would need a positional argsort; sorted order replays in DuckDB as
  ``list_sort(list_distinct(...))`` with zero extra machinery).

  Implementation is split-and-reassemble, NOT iterated string replace:
  ``split(text, RE, -1)`` yields the n+1 non-match segments and
  ``regexp_extract_all`` the n matches of the SAME regex scan, so the
  output is ``parts[0] + ph(m_0) + parts[1] + ... + ph(m_{n-1}) +
  parts[n]``. Iterated `replace` is wrong in the presence of
  substring-nested matches (masking ``a@b.co`` first corrupts a later
  ``a@b.com``); reassembly touches only true match spans.

- **Checksum-gated IBAN masking** (``iban_valid_expr`` /
  ``scrub_iban_expr``): candidate spans come from a regex, but only
  ISO 13616 mod-97-valid candidates are masked (the Presidio pattern the
  card scrubber already uses via Luhn — scrub.py:48). The mod-97 check is
  a native expression fold: rotate the first 4 chars to the end, expand
  letters to two digits (A=10..Z=35), then fold digit-by-digit with
  ``acc = (acc*10 + d) % 97`` — integer arithmetic end to end, bit-exact
  against the DuckDB oracle's ``list_reduce`` replay.

Scale shape: every operator here is a narrow per-row map over native
expressions (regexp scan + array HOFs) — zero Python, zero shuffle, rides
whatever scan/exchange the surrounding pipeline already pays for. The HOF
lambdas follow the engine-wide let-binding audit (SCALE.md): every
expensive subtree (the match array, the parts array, the rearranged IBAN
string) is bound once as a select-level column or lambda argument, never
re-derived per element.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ASCII-only patterns chosen to behave identically in Java regex (Spark),
# RE2 (DuckDB), and Python re — no lookaround, no backrefs, '-' at class
# end. Same dialect-portability contract as oracle/scrub.py:SCRUB_PATTERNS.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4,8}"
IBAN_PATTERN = r"\b[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}\b"


def _reassemble(col: Column, pattern: str, placeholder) -> Column:
    """Rebuild ``col`` with every match of ``pattern`` replaced by
    ``placeholder(match)`` (a lambda Column -> Column). Positional
    split/extract pairing over ONE regex scan; exact for nested-substring
    matches where iterated replace is not."""
    matches = F.regexp_extract_all(col, F.lit(pattern), F.lit(0))
    parts = F.split(col, pattern, -1)
    return F.concat(
        F.element_at(parts, 1),
        F.array_join(
            F.transform(
                matches,
                lambda m, i: F.concat(
                    placeholder(m), F.element_at(parts, i + F.lit(2))
                ),
            ),
            "",
        ),
    )


def pseudonymize_expr(
    col: Column, pattern: str, tag: str
) -> tuple[Column, Column]:
    """(rebuilt_text, n_distinct) with each distinct match of ``pattern``
    mapped to ``<TAG_k>``, k = 0-based rank in the sorted distinct match
    list — identical occurrences share one placeholder within a document."""
    ms = F.array_sort(
        F.array_distinct(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))
    )

    def _ph(m: Column) -> Column:
        return F.concat(
            F.lit(f"<{tag}_"),
            (F.array_position(ms, m) - 1).cast("string"),
            F.lit(">"),
        )

    return _reassemble(col, pattern, _ph), F.size(ms)


def iban_valid_expr(c: Column) -> Column:
    """ISO 13616 mod-97 == 1, as a pure integer expression fold (see module
    docstring). Letter expansion: int(ch, 36) -> two digits."""
    rearranged = F.concat(
        c.substr(F.lit(5), F.length(c)), c.substr(F.lit(1), F.lit(4))
    )
    digit_vals = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(rearranged)),
            lambda i: F.when(
                rearranged.substr(i, F.lit(1)).between("A", "Z"),
                F.array(
                    ((F.ascii(rearranged.substr(i, F.lit(1))) - 55) / 10).cast(
                        "int"
                    ),
                    (F.ascii(rearranged.substr(i, F.lit(1))) - 55) % 10,
                ),
            ).otherwise(
                F.array(F.ascii(rearranged.substr(i, F.lit(1))) - 48)
            ),
        )
    )
    return (
        F.aggregate(digit_vals, F.lit(0), lambda a, d: (a * 10 + d) % 97) == 1
    )


def scrub_iban_expr(col: Column) -> tuple[Column, Column, Column]:
    """(masked_text, n_candidates, n_valid): regex candidates that pass the
    mod-97 check become ``<IBAN>``; checksum-failing candidates are left
    in place (they are not account numbers — masking them would destroy
    ordinary text like uppercase product codes)."""
    cands = F.regexp_extract_all(col, F.lit(IBAN_PATTERN), F.lit(0))
    masked = _reassemble(
        col,
        IBAN_PATTERN,
        lambda m: F.when(iban_valid_expr(m), F.lit("<IBAN>")).otherwise(m),
    )
    n_valid = F.size(F.filter(cands, iban_valid_expr))
    return masked, F.size(cands), n_valid


# --- deterministic fixtures (gate corpus synthesis) ----------------------


def make_iban(cc: str, bban: str) -> str:
    """Generate a checksum-correct IBAN (check digits = 98 - mod97)."""
    digits = "".join(str(int(ch, 36)) for ch in bban + cc + "00")
    return f"{cc}{98 - int(digits) % 97:02d}{bban}"


def _corrupt(iban: str) -> str:
    """Bump the last digit mod 10 — still regex-shaped, checksum now fails."""
    return iban[:-1] + str((int(iban[-1]) + 1) % 10)


_VALID_IBANS = [
    make_iban("DE", "370400440532013000"),
    make_iban("DE", "100200300400500600"),
    make_iban("GB", "NWBK60161331926819"),
    make_iban("FR", "20041010050500013M02606"),
    make_iban("NL", "ABNA0417164300"),
    make_iban("ES", "21000418450200051332"),
    make_iban("IT", "X0542811101000000123456"),
    make_iban("PL", "61109010140000071219812874"[:24]),
]

# valid/invalid interleaved: doc_id % 16 even -> checksum-correct.
IBAN_DIM: list[str] = []
for _v in _VALID_IBANS:
    IBAN_DIM.extend([_v, _corrupt(_v)])


def synth_pii_docs(docs: DataFrame) -> DataFrame:
    """documents + deterministic PII injections (emails keyed off doc_id so
    ~1/7 of docs repeat one address — exercising the distinct/shared-
    placeholder branch — and an IBAN from the 16-entry valid/invalid dim).
    A real deployment feeds raw page text; the fixture makes the gate
    corpus self-describing in both engines."""
    d = F.col("doc_id")
    iban_pool = F.array(*[F.lit(s) for s in IBAN_DIM])
    txt = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" Contact p"),
        (d % 7).cast("string"),
        F.lit("@mail"),
        (d % 3).cast("string"),
        F.lit(".example.com or p"),
        ((d * 2) % 7).cast("string"),
        F.lit("@mail"),
        (d % 3).cast("string"),
        F.lit(".example.com, call +1-555-"),
        (1000 + d % 9000).cast("string"),
        F.lit(" pay to "),
        F.element_at(iban_pool, (d % 16 + 1).cast("int")),
        F.lit(" ref "),
        d.cast("string"),
        F.lit("."),
    )
    return docs.select("doc_id", txt.alias("text"))
