"""Bilingual dictionary ingestion + relational lookup (SURVEY.md §2.3 J5/J6).

The reference stores each dictionary as a dataclass with three inverted
indices (datatypes.py:564-666 Dictionary; :668-690 MultiDictionary routes a
query to every dictionary sharing a word, then merges ranked results). Here
the SAME semantics are one relational layout plus joins:

    entries(dict_id, term_lang, def_lang, entry_id, term, definition)
    index  (dict_id, entry_id, word)      -- distinct exact term words
    lookup: query tokens (casefolded, WITH multiplicity)
            JOIN index ON casefold(word)  -- broadcast: dictionaries are dims
            GROUP BY (query, dict, entry) COUNT(*)  -- == Counter.update calls
            rank (count desc, dict_id, entry_id)    -- most_common + tie-break

MultiDictionary routing (J6) disappears into the join: the reference prunes
dictionaries via a casefold index before looping; a single join against the
union of all dictionaries' indices IS that pruning (a dictionary sharing no
word simply contributes no rows). At scale the dictionary side stays the
broadcast dimension; the query corpus never shuffles.

CSV shape (reference dictionary_langid/*.csv, dictionaries/prodict/*.csv):
filename ``[lang] X-Y.csv``, header ``English,Other`` / ``Other,English``.

Row-wise oracle: ``DictionaryOracle`` mirrors Dictionary.lookup_terms
verbatim (incl. the case-variant multiplicity quirk: an entry holding both
'The' and 'the' scores +2 for one query token 'the'); tested equal.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator
from pathlib import Path

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from language_identification_spark.functions.text import casefold_udf as _casefold_udf
from language_identification_spark.oracle.tokenize import is_word_char

_FNAME_RE = re.compile(r"\[(?P<lang>\w+)\]\s*(?P<terms>[^-]+)-(?P<defs>[^.]+)\.csv$")

ENTRIES_SCHEMA = (
    "dict_id string, term_lang string, def_lang string, "
    "entry_id bigint, term string, definition string"
)


def read_bilingual_dictionary(
    spark: SparkSession, path: str
) -> DataFrame:
    """S2+J5 ingestion: one ``[lang] X-Y.csv`` file -> entries rows.

    Filename metadata becomes columns (the reference encodes term/definition
    languages in the filename); entry_id is the file row order (the
    reference's list index). Dictionaries are dimension data — a driver-side
    csv module read keeps row order deterministic (Spark's CSV reader gives
    no stable row numbering across splits), then the rows become a DataFrame
    that joins as a broadcast dimension."""
    import csv

    name = Path(path).name
    m = _FNAME_RE.search(name)
    if not m:
        raise ValueError(f"not a '[lang] X-Y.csv' dictionary filename: {name}")
    meta = m.groupdict()
    rows = []
    with open(path, newline="", encoding="utf-8") as f:
        reader = csv.reader(f)
        header = next(reader)
        if len(header) < 2:
            raise ValueError(f"bad dictionary header in {name}: {header}")
        for i, row in enumerate(reader):
            if len(row) < 2 or not row[0]:
                continue
            rows.append(
                (name, meta["terms"].strip().casefold(), meta["defs"].strip().casefold(),
                 i, row[0], row[1])
            )
    return spark.createDataFrame(rows, schema=ENTRIES_SCHEMA)


BHANOT_SRC = "/root/reference/dictionaries/bhanot/bhanot_dictionary.py"
_BHANOT_SENSE_RE = re.compile(r"\(\d+\)(?P<def>[^(]+)")


def export_bhanot_csv(
    out_path: str, src_path: str = BHANOT_SRC
) -> str:
    """Convert the reference's full bhanot Malay-English dictionary DATA
    blob to its own ``[zsm] Malay-English.csv`` shape, replaying the
    conversion the reference ships in the blob's __main__ tail
    (bhanot/bhanot_dictionary.py:15570-15589): numbered senses
    ``(1) a (2) b`` expand one row per sense, each definition then splits
    on ';', both sides stripped + casefolded. The blob is parsed with
    ``ast.literal_eval`` — scraped dictionary CONTENT ingested as data,
    no reference code imported or executed. Returns ``out_path`` (named
    ``[zsm] Malay-English.csv`` inside, so ``read_bilingual_dictionary``'s
    filename-metadata contract applies unchanged)."""
    import ast
    import csv

    tree = ast.parse(Path(src_path).read_text(encoding="utf-8"))
    definitions = None
    for node in tree.body:
        if (
            isinstance(node, ast.Assign)
            and getattr(node.targets[0], "id", None) == "definitions"
        ):
            definitions = ast.literal_eval(node.value)
            break
    if not isinstance(definitions, dict):
        raise ValueError(f"no definitions dict found in {src_path}")
    rows: list[tuple[str, str]] = []
    for other, eng in definitions.items():
        if re.search(r"\(\d", eng):
            for m in _BHANOT_SENSE_RE.finditer(eng):
                rows.append((other, m.group("def")))
        else:
            rows.append((other, eng))
    rows = [
        (other.strip().casefold(), x.strip().casefold())
        for other, eng in rows
        for x in eng.split(";")
    ]
    out = Path(out_path)
    out.mkdir(parents=True, exist_ok=True)
    csv_path = out / "[zsm] Malay-English.csv"
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["Other", "English"])
        w.writerows(rows)
    return str(csv_path)


def read_bilingual_dictionaries(spark: SparkSession, paths: list[str]) -> DataFrame:
    """MultiDictionary ingestion: union of per-file entries (J6 layout —
    dict_id keys the routing)."""
    out = None
    for p in sorted(paths):
        df = read_bilingual_dictionary(spark, p)
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError("no dictionary files")
    return out


def _dict_tokenize(text: str) -> list[str]:
    """The reference Dictionary's exact token stream (datatypes.py:606-609
    tokenizes with the DEFAULT unicode_tokenize, words_only=False —
    verified against the reference: word-char runs, each punctuation/symbol
    char as its own token, NO apostrophe merge, so "don't" -> don, ', t and
    'self-taught' -> self, -, taught). Space tokens are omitted: the
    reference reserves vocab index 0 for ' ' and excludes it from both
    inverted indices (datatypes.py:582-584, :624-628)."""
    tokens: list[str] = []
    start = -1
    for i, ch in enumerate(text):
        if is_word_char(ch):
            if start < 0:
                start = i
            continue
        if start >= 0:
            tokens.append(text[start:i])
            start = -1
        if not ch.isspace():
            tokens.append(ch)
    if start >= 0:
        tokens.append(text[start:])
    return tokens


@F.pandas_udf(ArrayType(StringType()))
def _tokenize_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Reference tokenization of terms/queries: whitespace-normalize then
    the Dictionary token stream (datatypes.py:606-609, :634)."""
    for series in batches:
        yield series.map(
            lambda t: [] if t is None else _dict_tokenize(" ".join(t.strip().split()))
        )


def term_word_index(entries: DataFrame) -> DataFrame:
    """The inverted index as rows: distinct (dict_id, entry_id, word) over
    EXACT term words (vocab variants kept — the casefold happens at join
    time, preserving the reference's per-variant multiplicity)."""
    return (
        entries.select(
            "dict_id",
            "entry_id",
            F.explode(_tokenize_udf(F.col("term"))).alias("word"),
        )
        .distinct()
        .select(
            "dict_id", "entry_id", _casefold_udf(F.col("word")).alias("cf_word"), "word"
        )
    )


def lookup_terms(
    entries: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """J5+J6: rank dictionary entries by shared-word count for each query.

    ``queries``: (query_id, text). Tokens keep their multiplicity (the
    reference Counter-updates once per query token occurrence per matching
    vocab variant). Output: (query_id, dict_id, entry_id, term, definition,
    n_shared, rank) — rank by (n_shared desc, dict_id, entry_id), top k."""
    index = term_word_index(entries)
    q_words = queries.select(
        "query_id",
        F.explode(
            _tokenize_udf(_casefold_udf(F.col("text")))
        ).alias("cf_word"),  # casefold BEFORE tokenize, like lookup_terms
    )
    scored = (
        q_words.join(F.broadcast(index), "cf_word")
        .groupBy("query_id", "dict_id", "entry_id")
        .agg(F.count("*").alias("n_shared"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_shared"), F.asc("dict_id"), F.asc("entry_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .join(
            F.broadcast(
                entries.select("dict_id", "entry_id", "term", "definition")
            ),
            ["dict_id", "entry_id"],
        )
        .select(
            "query_id", "dict_id", "entry_id", "term", "definition", "n_shared", "rank"
        )
    )


class DictionaryOracle:
    """Row-wise mirror of the reference Dictionary/MultiDictionary lookup
    (datatypes.py:632-656, :682-690): per dictionary, a casefold word ->
    vocab variants -> entry sets chain; Counter.update per query token per
    variant; merged ranking (count desc, dict_id, entry_id)."""

    def __init__(self) -> None:
        # dict_id -> casefolded word -> {exact variants}
        self._variants: dict[str, dict[str, set[str]]] = {}
        # dict_id -> exact word -> {entry_id}
        self._entry_index: dict[str, dict[str, set[int]]] = {}
        self._entries: dict[tuple[str, int], tuple[str, str]] = {}

    def add(self, dict_id: str, entry_id: int, term: str, definition: str) -> None:
        words = _dict_tokenize(" ".join(term.strip().split()))
        variants = self._variants.setdefault(dict_id, {})
        index = self._entry_index.setdefault(dict_id, {})
        for w in words:
            variants.setdefault(w.casefold(), set()).add(w)
            index.setdefault(w, set()).add(entry_id)
        self._entries[(dict_id, entry_id)] = (term, definition)

    def lookup(self, query_id, text: str, k: int = 5) -> list[tuple]:
        matches: Counter[tuple[str, int]] = Counter()
        tokens = _dict_tokenize(" ".join(text.strip().casefold().split()))
        for tok in tokens:
            for dict_id, variants in self._variants.items():
                for variant in variants.get(tok, ()):
                    for eid in self._entry_index[dict_id].get(variant, ()):
                        matches[(dict_id, eid)] += 1
        ranked = sorted(matches.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out = []
        for rank, ((dict_id, eid), n) in enumerate(ranked[:k], start=1):
            term, definition = self._entries[(dict_id, eid)]
            out.append((query_id, dict_id, eid, term, definition, n, rank))
        return out
