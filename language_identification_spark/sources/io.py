"""Sources and sinks (SURVEY.md §2.1 S1-S4, K1-K4), Spark-first.

Every reader takes an EXPLICIT schema — schema inference is a full extra pass
over the data at 100 TB and non-deterministic under dirty rows (the reference
reads positionally with asserts, char stats.ipynb cell 1; we make the schema a
contract instead). Sinks map the reference's manual per-language file fan-out
(split-ngram-langs.ipynb cells 1-4: a dict of open file handles as a hash
partitioner) onto ``write.partitionBy`` — Catalyst plans the exchange, the
committer makes it atomic, and partition pruning on read is free.

On a production cluster the parquet paths become Iceberg tables
(``format("iceberg")``) with identical call shapes; parquet is the sandbox
stand-in (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# S1: the GDELT-style chargram stream (datasets/chargram.sample.tsv shape:
# timestamp, langName, n, gram, count — tab-separated)
CHARGRAM_SCHEMA = "ts string, lang_name string, n int, gram string, count bigint"


def read_chargram_csv(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    """S1/S2: delimited scan with explicit schema and no NA coercion
    (the reference's pd.read_csv(dtype='object', keep_default_na=False),
    cleanup.ipynb cell 5 — empty strings stay empty strings)."""
    return (
        spark.read.schema(CHARGRAM_SCHEMA)
        .option("sep", sep)
        .option("nullValue", "\\N")  # only the explicit \\N sentinel maps to null
        .csv(path)
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """The north-rule input table (BASELINE.json input_hint schema)."""
    from language_identification_spark.fixtures import PAGES_SCHEMA

    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def read_wordlist(spark: SparkSession, path: str) -> DataFrame:
    """S4: plain-text wordlist -> (word) rows (datatypes.py:752-754 reads
    ``open(...).read().split()``; here each line may hold several words)."""
    return (
        spark.read.text(path)
        .select(F.explode(F.split(F.trim("value"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )


def read_scripts_json(spark: SparkSession, path: str) -> DataFrame:
    """S3: scripts.json-shaped input ({script: {langs: [...], chars:
    [[lo,hi],...]}}) -> exploded (script, lang, cp_lo, cp_hi) dimension rows
    (loader semantics of scripts_langid.py:16-33 / J12 fan-out). Driver-side
    json.load — the file is KBs of dimension data, not corpus data."""
    import json

    with open(path) as f:
        raw = json.load(f)
    rows = [
        (script, lang, int(lo), int(hi))
        for script, spec in sorted(raw.items())
        for lang in sorted(spec.get("langs", []))
        for lo, hi in spec.get("chars", [])
    ]
    return spark.createDataFrame(
        rows, schema="script string, lang string, cp_lo int, cp_hi int"
    )


def merge_wordlists(dfs: list[DataFrame]) -> DataFrame:
    """SO5: union word lists across sources then dedupe
    (merge_wordlists.ipynb cells 1-2) — the named operator form of
    unionByName + distinct; pairs with A4/J9 downstream."""
    if not dfs:
        raise ValueError("no wordlists to merge")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out.distinct()


def has_text_filter(df: DataFrame, col: str = "term") -> DataFrame:
    """P8: keep rows whose value contains at least one letter
    (cleanup.ipynb cell 2 has_text)."""
    return df.filter(F.col(col).rlike(r"\p{L}"))


def has_digit_filter(df: DataFrame, col: str = "term") -> DataFrame:
    """P8: keep rows whose value contains at least one digit
    (cleanup.ipynb cell 2 has_digit)."""
    return df.filter(F.col(col).rlike(r"\p{N}"))


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------


def write_json(df: DataFrame, path: str) -> None:
    """K2: JSON sink (char stats.ipynb cells 4-12 json.dump of aggregates) —
    one JSON object per row, partition-parallel."""
    df.write.mode("overwrite").json(path)


def write_partitioned_by_lang(df: DataFrame, path: str) -> None:
    """K1: one directory per language — the reference's per-language file
    fan-out (split-ngram-langs.ipynb cells 1-4) as a partitioned write; reads
    back with partition pruning (lang=... directories)."""
    df.write.mode("overwrite").partitionBy("lang").parquet(path)


def write_filtered_csv(df: DataFrame, path: str, min_count: int = 3) -> None:
    """K3: (word, count) sink keeping count >= min_count
    (common_words.ipynb cells 5,9)."""
    (
        df.filter(F.col("count") >= min_count)
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def write_sorted_wordlists(df: DataFrame, path: str) -> None:
    """K4: per-language sorted unique word files (merge_wordlists.ipynb
    cell 5): dedupe, partition by lang, sort within each partition."""
    (
        df.select("lang", "word")
        .distinct()
        .repartition("lang")
        # sort by (lang, word): the partitioned writer requires rows grouped
        # by the partition column and re-sorts if they are not — sorting by
        # word alone would be destroyed by that writer-side re-sort
        .sortWithinPartitions("lang", "word")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(path)
    )
