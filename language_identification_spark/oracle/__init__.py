"""Pure-Python row-wise oracle defining the engine's per-document semantics.

This package is the single source of truth for what every text transformation
computes. The Spark operators in ``language_identification_spark.operators``
call these same functions inside Arrow-batched pandas UDFs, and the pytest
parity suite asserts the distributed pipeline reproduces the oracle
byte-identically per url (BASELINE.json input_hint).

Semantics re-implemented (NOT copied) from the reference repo
``averykhoo/language-identification``; citations are file:line into
``/root/reference``. Reference-only dependencies that are unavailable here
(ftfy, bs4.UnicodeDammit, the fastText native lib) are replaced by
deterministic pure-Python equivalents, gated so the real libraries are used
when importable.
"""

from language_identification_spark.oracle.extract import (  # noqa: F401
    BYTE_LENGTH_LIMIT,
    clean_text,
    decode_html,
    extract_text,
    strip_html,
    truncate_text,
)
from language_identification_spark.oracle.tokenize import (  # noqa: F401
    char_ngrams,
    sentence_split,
    unicode_tokenize,
    word_ngrams,
)
