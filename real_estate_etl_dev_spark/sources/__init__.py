"""Source layer: parquet/CSV/JSON readers and scan-stage operators."""

from .readers import TABLES, load_table, read_csv_source, read_json_source, register_views
from .scans import fetch_details, html_in_json, incremental_seed, page_fanout

__all__ = [
    "TABLES",
    "load_table",
    "read_csv_source",
    "read_json_source",
    "register_views",
    "fetch_details",
    "html_in_json",
    "incremental_seed",
    "page_fanout",
]
