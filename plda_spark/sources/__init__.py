"""Sources and sinks: parquet tables, plda text format, UCI bag-of-words,
JSONL and CSV (both with corrupt-row quarantine), sharded/bucketed sinks,
a date-partitioned sink with pruning-pinned reads, Z-order (Morton)
clustered writes, and Common Crawl WARC/WET shards — extracted-text WET and raw-HTML
WARC response records (Content-Length-exact record walking,
file-granular parallelism, dependency-free HTML→text extraction)."""

from .bucketed import read_bucketed, write_bucketed  # noqa: F401
from .compact import compact_parquet, dataset_file_stats  # noqa: F401
from .csv import (  # noqa: F401
    read_csv,
    read_csv_stream,
    read_csv_with_errors,
    write_csv,
)
from .jsonl import (  # noqa: F401
    read_jsonl,
    read_jsonl_stream,
    read_jsonl_with_errors,
    write_dataset,
)
from .partitioned import read_partitioned, write_partitioned_by_day  # noqa: F401
from .plda_text import read_plda_corpus, write_plda_corpus  # noqa: F401
from .tables import load_all, load_table  # noqa: F401
from .uci import read_uci_docword, uci_to_corpus  # noqa: F401
from .warc import (  # noqa: F401
    drop_boilerplate,
    extract_html_blocks,
    extract_html_text,
    read_warc,
    read_warc_stream,
    wet_from_warc,
    write_warc,
)
from .wet import read_wet, read_wet_stream, write_wet  # noqa: F401
from .zorder import write_zordered, zvalue_col  # noqa: F401

__all__ = [
    "read_bucketed",
    "write_bucketed",
    "write_zordered",
    "zvalue_col",
    "read_csv",
    "read_csv_stream",
    "read_csv_with_errors",
    "write_csv",
    "read_jsonl",
    "read_jsonl_stream",
    "read_jsonl_with_errors",
    "write_dataset",
    "read_partitioned",
    "write_partitioned_by_day",
    "read_plda_corpus",
    "write_plda_corpus",
    "load_all",
    "load_table",
    "read_uci_docword",
    "uci_to_corpus",
    "read_wet",
    "read_wet_stream",
    "write_wet",
    "read_warc",
    "read_warc_stream",
    "write_warc",
    "extract_html_text",
    "extract_html_blocks",
    "drop_boilerplate",
    "wet_from_warc",
    "compact_parquet",
    "dataset_file_stats",
]
