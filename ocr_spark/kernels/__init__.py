"""Pure extraction kernels — no Spark imports.

Each kernel is a deterministic, batch-friendly function shared by BOTH the
Spark pipeline (inside mapInArrow / pandas_udf stages) and the pandas oracle
(ocr_spark.oracle). Sharing one implementation is what makes per-turn text
equality achievable bit-for-bit.
"""

from ocr_spark.kernels.salvage import EMPTY_SENTINEL, salvage_json
from ocr_spark.kernels.align import (
    NULL_TOKENS,
    NA_SENTINEL,
    clean_null_tokens,
    page_table_from_records,
    align_pages,
    serialize_table,
)
from ocr_spark.kernels.htmlstrip import strip_html
from ocr_spark.kernels.grid import (
    encode_grid_payload,
    decode_grid_payload,
    render_grid,
    detect_grid,
    extract_grid_table,
    rot90_payload,
)

__all__ = [
    "EMPTY_SENTINEL",
    "salvage_json",
    "NULL_TOKENS",
    "NA_SENTINEL",
    "clean_null_tokens",
    "page_table_from_records",
    "align_pages",
    "serialize_table",
    "strip_html",
    "encode_grid_payload",
    "decode_grid_payload",
    "render_grid",
    "detect_grid",
    "extract_grid_table",
    "rot90_payload",
]
