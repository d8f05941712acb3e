"""Report-edge pagination/sort/diff-highlight tests (SURVEY C1-C6)."""

import pytest
from pyspark.sql import functions as F

from data_check_spark.plans.report import diff_cells, paginate, sort_report


@pytest.fixture(scope="module")
def frame(spark):
    return spark.range(137).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))


def test_paginate_pages_partition_the_frame(spark, frame):
    seen = []
    for page in range(1, 7):
        rows = paginate(frame, "k", page=page, page_size=25).collect()
        seen.extend(r["k"] for r in rows)
    assert seen == list(range(137))  # 6 pages of 25 cover all 137, in order, no overlap


def test_paginate_clamps_and_validates(spark, frame):
    assert paginate(frame, "k", page=0, page_size=25).count() == 25  # clamps to page 1
    with pytest.raises(ValueError, match="page_size"):
        paginate(frame, "k", page=1, page_size=33)


def test_paginate_out_of_range_shows_last_page(spark, frame):
    """Reference parity (streamlit number_input clamps to the page
    count): page 99 of 6 shows the last page, never a blank one."""
    last = paginate(frame, "k", page=6, page_size=25).collect()
    beyond = paginate(frame, "k", page=99, page_size=25).collect()
    assert beyond == last
    assert len(last) == 137 - 5 * 25


def test_sort_report(spark, frame):
    top = sort_report(frame, "k", ascending=False).limit(3).collect()
    assert [r["k"] for r in top] == [136, 135, 134]


def test_diff_cells(spark):
    df = spark.createDataFrame(
        [(1, "a", "a", None, None), (2, "a", "b", "x", None)],
        "pk bigint, c__1 string, c__2 string, d__1 string, d__2 string",
    )
    out = {r["pk"]: (r["c__diff"], r["d__diff"]) for r in diff_cells(df, ["c", "d"]).collect()}
    assert out[1] == (False, False)  # equal, and NULL==NULL under sentinel semantics
    assert out[2] == (True, True)
