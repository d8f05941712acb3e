from data_check_spark.functions.canonical import (  # noqa: F401
    canonical_string,
    rowdiff_neq,
    ratio_equal_pred,
    ratio_not_null_pred,
)
