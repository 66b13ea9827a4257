from language_identification_spark.sources.io import (
    read_chargram_csv,
    read_pages,
    read_scripts_json,
    read_wordlist,
    write_filtered_csv,
    write_partitioned_by_lang,
    write_sorted_wordlists,
)

__all__ = [
    "read_chargram_csv",
    "read_pages",
    "read_scripts_json",
    "read_wordlist",
    "write_filtered_csv",
    "write_partitioned_by_lang",
    "write_sorted_wordlists",
]
