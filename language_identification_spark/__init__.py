"""language_identification_spark — a PySpark-native web-text quality-filter engine.

A from-scratch, Spark-first realization of the computations in the reference repo
``averykhoo/language-identification`` (read-only at /root/reference), built for
10^12-document Common-Crawl-style corpora:

- text extraction from raw HTML bytes (reference chain: utils.py:15-37 ensure_unicode,
  remove_html_tags.py:146-164, preprocessing.py:16-27 clean_text)
- language identification (fastText-shaped batch classifier with a char-n-gram
  Naive Bayes fallback + unicode-script classifier, reference fasttext_wrapper.py:39-45
  and scripts_langid.py:40-84)
- char-n-gram LM perplexity scoring (reference modified_kneser_ney.py)
- C4/Gopher-style heuristic quality rules
- compiled-regex PII/boilerplate scrubbing (reference README.md:128-146 spec)

Architecture: DataFrame-first. All per-document text work runs in Arrow-batched
pandas UDFs (never per-row Python UDFs); all aggregation/joins are Spark built-ins
so Catalyst handles pushdown, partial aggregation, and broadcast selection.
"""

__version__ = "0.1.0"

from language_identification_spark.session import get_spark  # noqa: F401
