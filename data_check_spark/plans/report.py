"""Report-edge helpers — the reference's client-side result-frame
operations (SURVEY §2.8 / C1-C6), re-expressed so the heavy work stays
in Spark and only the requested page reaches the driver.

Reference behaviors covered:

* **paginate** — the report page slicer
  (``/root/reference/data_check/streamlit_app.py:319-346``: page sizes
  25/50/100/500, 1-based page number clamped to the page count). The
  reference slices a fully-collected pandas frame; here the slice is a
  Spark ``offset().limit()`` over a total-ordered frame, so only
  ``page_size`` rows are ever collected — the 10^12-row-safe shape.
* **sort_report** — the report sort toggle
  (``streamlit_app.py:303-319``: any column, asc/desc).
* **diff_cells** — the highlight predicate behind
  ``highlight_diff_dataset`` (``streamlit_app.py:24-28``): marks the
  ``col__1``/``col__2`` pairs that differ. The reference styles a
  pandas frame; the engine equivalent emits a boolean per pair so any
  front-end can style without re-deriving diff semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PAGE_SIZES = (25, 50, 100, 500)  # streamlit_app.py:323-325


def paginate(
    df: DataFrame,
    order_by: str | list[str],
    page: int = 1,
    page_size: int = 50,
) -> DataFrame:
    """Page ``page`` (1-based) of ``df`` under a total order.

    ``order_by`` must give a deterministic total order (include a
    unique key) — otherwise pages can overlap between calls, the same
    trap as any OFFSET pagination. Page size choices mirror the
    reference's selectbox; page numbers clamp to [1, page count] like
    its number_input (an out-of-range request shows the last page,
    never a blank one). The upper clamp costs one count() job — paid
    only for page > 1, and report frames are bounded (violation
    dumps carry LIMITs).
    """
    if page_size not in PAGE_SIZES:
        raise ValueError(f"page_size must be one of {PAGE_SIZES}, got {page_size}")
    page = max(1, int(page))
    if page > 1:
        n = df.count()
        page = min(page, max(1, -(-n // page_size)))
    cols = [order_by] if isinstance(order_by, str) else list(order_by)
    return df.orderBy(*cols).offset((page - 1) * page_size).limit(page_size)


def sort_report(df: DataFrame, column: str, ascending: bool = True) -> DataFrame:
    """The report sort toggle (streamlit_app.py:303-319)."""
    return df.orderBy(F.asc(column) if ascending else F.desc(column))


def diff_cells(df: DataFrame, columns: list[str], reference_mode: bool = True) -> DataFrame:
    """For each compared column, add ``<col>__diff`` = the pair
    (col__1, col__2) differs under the engine's null-sentinel
    semantics — the machine-readable version of the reference's cell
    highlighting (streamlit_app.py:24-28)."""
    from data_check_spark.functions.canonical import rowdiff_neq

    out = df
    for c in columns:
        out = out.withColumn(
            f"{c}__diff",
            rowdiff_neq(F.col(f"{c}__1"), F.col(f"{c}__2"), reference_mode),
        )
    return out
