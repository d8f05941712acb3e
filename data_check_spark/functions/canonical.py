"""Value canonicalization + comparison predicates, reproducing the
reference's semantics exactly (SURVEY.md §2.10).

Reference behavior being reproduced:

* **Cast-to-string canonicalization** — every compared column is
  lowered to a string domain before comparison
  (``/root/reference/data_check/models/table.py:84-116``):
  - plain strings used as-is (table.py:90-94)
  - arrays → sorted-distinct comma-join (table.py:96-102), i.e.
    order- and duplicate-insensitive comparison
  - structs → skipped by the reference (table.py:104-110); we support
    them via ``to_json`` in upgraded mode
  - everything else → CAST(x AS STRING) (table.py:112-115)

* **Row-diff predicate (P3)** — ``COALESCE(a,'none') <> COALESCE(b,'none')``
  (``processors/bigquery.py:179``): NULL vs NULL is NOT a diff, and —
  sentinel collision, faithfully reproduced — a literal 'none' vs NULL
  is also not a diff.

* **Ratio-equal predicate (P4)** — ``COALESCE(a,'none') = COALESCE(b,'non')``
  (``processors/bigquery.py:215``): asymmetric sentinels mean NULL vs
  NULL counts as UNEQUAL, and a literal 'non' on side 1 vs NULL on
  side 2 counts as EQUAL (latent reference bug, reproduced in
  ``reference_mode=True``; fixed via null-safe equality otherwise).

* **ratio_not_null** — ``COALESCE(a, b) IS NOT NULL`` over the inner
  join (``processors/bigquery.py:214``): either side non-null.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROWDIFF_SENTINEL = "none"   # bigquery.py:179 — both sides
RATIO_SENTINEL_1 = "none"   # bigquery.py:215 — side 1
RATIO_SENTINEL_2 = "non"    # bigquery.py:215 — side 2 (sic, reference typo)


def canonical_string(col: Column, dtype: T.DataType, structs: bool = True) -> Column:
    """Lower any column to the reference's canonical string domain.

    Arrays are compared order- and duplicate-insensitively
    (sorted-distinct comma-join, ref table.py:96-102). Structs/maps are
    unsupported by the reference; here they canonicalize via to_json
    unless ``structs=False`` (reference-parity mode drops them at
    schema-intersection time instead, see operators/schema_diff.py).
    """
    if isinstance(dtype, T.StringType):
        return col
    if isinstance(dtype, T.ArrayType):
        inner = F.array_distinct(col)
        if not isinstance(dtype.elementType, T.StringType):
            inner = F.transform(inner, lambda x: x.cast("string"))
        return F.array_join(F.array_sort(inner), ",")
    if isinstance(dtype, (T.StructType, T.MapType)):
        if not structs:
            raise ValueError("struct/map columns unsupported in reference-parity mode")
        return F.to_json(col)
    if isinstance(dtype, T.BinaryType):
        return F.base64(col)
    return col.cast("string")


def rowdiff_neq(c1: Column, c2: Column, reference_mode: bool = True) -> Column:
    """Per-column inequality for the row-level diff (ref P3).

    reference_mode reproduces the 'none' sentinel trick verbatim
    (bigquery.py:179, golden SQL tests/processors/test_bigquery.py:55-58);
    otherwise uses proper null-safe inequality.
    """
    if reference_mode:
        return F.coalesce(c1, F.lit(ROWDIFF_SENTINEL)) != F.coalesce(
            c2, F.lit(ROWDIFF_SENTINEL)
        )
    return ~c1.eqNullSafe(c2)


def ratio_equal_pred(c1: Column, c2: Column, reference_mode: bool = True) -> Column:
    """Equality predicate feeding count_equal (ref P4, bigquery.py:215).

    reference_mode keeps the asymmetric-sentinel quirk (NULL==NULL is
    unequal; 'non' vs NULL is equal). Non-reference mode: both sides
    non-null and equal.
    """
    if reference_mode:
        return F.coalesce(c1, F.lit(RATIO_SENTINEL_1)) == F.coalesce(
            c2, F.lit(RATIO_SENTINEL_2)
        )
    return c1.isNotNull() & c2.isNotNull() & (c1 == c2)


def ratio_not_null_pred(c1: Column, c2: Column) -> Column:
    """Either side non-null (ref bigquery.py:214)."""
    return F.coalesce(c1, c2).isNotNull()
