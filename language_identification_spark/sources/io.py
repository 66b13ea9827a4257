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


def read_pages_lenient(spark: SparkSession, path: str) -> DataFrame:
    """Schema-tolerant pages reader for real crawl-dump drift.

    Production dumps never match the contract schema exactly: early
    snapshots lack columns added later (no ``lang`` before the tagger
    ran), exporters rename nothing but ADD debug columns, and a typed
    column occasionally arrives as its string form (``warc_ts`` written
    as ISO text). A strict ``.schema(...)`` read silently nulls every
    column whose Parquet type differs — far worse than failing.

    Contract: read with the FILE's own schema, then reconcile to
    PAGES_SCHEMA: missing columns materialize as typed nulls, matching
    columns cast to the contract type (safe casts only — string
    timestamps parse, binary/string coerce; an incompatible type raises
    loudly with the column name), extra columns are preserved AFTER the
    contract columns so downstream ``select`` order is stable. Pure
    projection — no data pass, no Python.
    """
    from pyspark.sql.types import _parse_datatype_string

    from language_identification_spark.fixtures import PAGES_SCHEMA

    df = spark.read.parquet(path)
    want = _parse_datatype_string(PAGES_SCHEMA)
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in want.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name] == f.dataType:
            cols.append(F.col(f.name))
        else:
            src, dst = have[f.name].simpleString(), f.dataType.simpleString()
            ok = (src, dst) in {
                ("string", "timestamp"), ("string", "binary"),
                ("binary", "string"), ("int", "bigint"),
                ("bigint", "string"), ("date", "timestamp"),
            }
            if not ok:
                raise ValueError(
                    f"read_pages_lenient: column {f.name!r} has "
                    f"incompatible type {src} (contract: {dst})"
                )
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    extras = [F.col(c) for c in df.columns if c not in {f.name for f in want.fields}]
    return df.select(*cols, *extras)


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


# categories the reference keeps when building script charsets
# (CharSet.filter(['L*','S*']), script_langid/datatypes.py:17-64)
_UCD_KEEP_GC = r"^(L.|S.)$"


def read_ucd_xml(spark: SparkSession, path: str) -> DataFrame:
    """S5: UCD ``ucd.all.flat.xml`` scan -> (cp_lo, cp_hi, gc, sc) rows.

    The reference does this once, offline, with BeautifulSoup
    (iso15924/parse-ucd.ipynb cells 2-5). Here it is a distributed line
    scan: ``spark.read.text`` + native regexp attribute extraction — no XML
    library, no Python in the loop, splittable across executors (the real
    file is ~200 MB of one-element-per-line records; a DOM parse is
    driver-bound and ~50x the memory). Handles both single-codepoint
    (``cp="0041"``) and range (``first-cp="3400" last-cp="4DB5"``)
    elements; attribute order doesn't matter because each attribute is
    extracted independently."""
    lines = spark.read.text(path).filter(F.col("value").contains("<char"))
    # (?<![\w-]) so cp= does not match inside first-cp= / last-cp=
    attr = lambda name: F.regexp_extract(  # noqa: E731
        "value", rf'(?<![\w-]){name}="([0-9A-Fa-f]+)"', 1
    )
    sattr = lambda name: F.regexp_extract(  # noqa: E731
        "value", rf'(?<![\w-]){name}="([^"]*)"', 1
    )
    hex2long = lambda c: F.conv(c, 16, 10).cast("long")  # noqa: E731
    return (
        lines.select(
            F.coalesce(
                F.nullif(attr("cp"), F.lit("")),
                F.nullif(attr("first-cp"), F.lit("")),
            ).alias("lo_hex"),
            F.coalesce(
                F.nullif(attr("cp"), F.lit("")),
                F.nullif(attr("last-cp"), F.lit("")),
            ).alias("hi_hex"),
            F.nullif(sattr("gc"), F.lit("")).alias("gc"),
            F.nullif(sattr("sc"), F.lit("")).alias("sc"),
        )
        .filter(F.col("lo_hex").isNotNull())
        .select(
            hex2long(F.col("lo_hex")).alias("cp_lo"),
            hex2long(F.col("hi_hex")).alias("cp_hi"),
            "gc",
            "sc",
        )
    )


def ucd_script_charsets(ucd: DataFrame) -> DataFrame:
    """S5 downstream: per-script range-compressed charsets after the
    letters+symbols category filter — the distributed form of the
    scripts.json build (parse-ucd.ipynb cells 5-19). Adjacent/overlapping
    ranges are coalesced with gaps-and-islands (running-max window keyed by
    script): per-script data is tiny (<=few hundred ranges), so the window
    partitions are small and the single shuffle is on the script key."""
    from pyspark.sql import Window

    kept = ucd.filter(
        F.col("gc").rlike(_UCD_KEEP_GC) & F.col("sc").isNotNull()
    )
    w = Window.partitionBy("sc").orderBy("cp_lo", "cp_hi")
    prev_max = F.max("cp_hi").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        prev_max.isNull() | (F.col("cp_lo") > prev_max + 1)
    ).cast("int")
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        kept.withColumn("island", island)
        .groupBy("sc", "island")
        .agg(F.min("cp_lo").alias("cp_lo"), F.max("cp_hi").alias("cp_hi"))
        .select("sc", "cp_lo", "cp_hi")
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


# P8 character classes — single source of truth, shared with the
# term_cleanup gate query (queries.py). Java-regex dialect; the DuckDB
# oracle states the same classes in RE2 dialect ([\pL\pM] / [0-9]).
HAS_TEXT_CLASS = r"[\p{L}\p{M}]"
HAS_DIGIT_CLASS = r"[0-9]"


def has_text_filter(df: DataFrame, col: str = "term") -> DataFrame:
    """P8: keep rows with at least one find_words token, i.e. >=1
    letter-or-mark char (cleanup.ipynb cell 2 has_text over tmp.py
    find_words, whose char class is L* + M* — oracle/tokenize.py:201)."""
    return df.filter(F.col(col).rlike(HAS_TEXT_CLASS))


def has_digit_filter(df: DataFrame, col: str = "term") -> DataFrame:
    """P8: keep rows containing an ASCII digit. The reference checks
    membership in the literal string '1234567890' — the unicode isdigit
    variant is commented out there (cleanup.ipynb cell 2 has_digit), so
    [0-9], NOT \\p{N}, is the faithful class."""
    return df.filter(F.col(col).rlike(HAS_DIGIT_CLASS))


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------


def write_json(df: DataFrame, path: str) -> None:
    """K2: JSON sink (char stats.ipynb cells 4-12 json.dump of aggregates) —
    one JSON object per row, partition-parallel."""
    df.write.mode("overwrite").json(path)


def write_charsets_json(charsets: DataFrame, path: str | None = None) -> str:
    """K2's second shape: the single-document charset-ranges JSON of
    MultiCharSet.to_json (reference datatypes.py:549-561 — scripts.json is
    built this way in parse-ucd.ipynb cell 19): ``{script: [[lo, hi],
    ...]}``, indent=4. Input is the (sc, cp_lo, cp_hi) frame of
    ucd_script_charsets. The collect is DIMENSION-sized (92 scripts x
    <=few hundred coalesced ranges — UCD-bounded, corpus-independent), so
    driver assembly is the correct shape; script order is sorted name
    (deterministic; the reference uses charset insertion order). Returns
    the JSON string, writing it to ``path`` when given, like to_json."""
    import json as _json

    rows = charsets.select("sc", "cp_lo", "cp_hi").collect()
    out: dict[str, list[list[int]]] = {}
    for r in sorted(rows, key=lambda r: (r["sc"], r["cp_lo"])):
        out.setdefault(r["sc"], []).append([r["cp_lo"], r["cp_hi"]])
    text = _json.dumps(out, indent=4, ensure_ascii=False)
    if path is not None:
        with open(path, "w", encoding="ascii") as f:
            f.write(text)
    return text


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
