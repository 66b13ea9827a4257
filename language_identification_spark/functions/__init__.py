from language_identification_spark.functions.deseret import (
    deseret_phonemes,
    fix_deseret,
)
from language_identification_spark.functions.text import (
    casefold_udf,
    char_ngrams_expr,
    clamp_repeats_expr,
    damerau_levenshtein_udf,
    label_strip_expr,
    log2_expr,
    tokenize_approx_expr,
    truncate_utf8_udf,
    word_ngrams_expr,
)

__all__ = [
    "casefold_udf",
    "deseret_phonemes",
    "fix_deseret",
    "char_ngrams_expr",
    "clamp_repeats_expr",
    "damerau_levenshtein_udf",
    "label_strip_expr",
    "log2_expr",
    "tokenize_approx_expr",
    "truncate_utf8_udf",
    "word_ngrams_expr",
]
