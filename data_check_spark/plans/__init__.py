from data_check_spark.plans.suite import CheckSuite, SuiteResult  # noqa: F401
from data_check_spark.plans.manifest import Manifest  # noqa: F401
from data_check_spark.plans.audit import write_audit  # noqa: F401
from data_check_spark.plans.config import load_suite, suite_from_config  # noqa: F401
from data_check_spark.plans.history import metric_anomalies  # noqa: F401
from data_check_spark.plans.observed import ObservedSuite  # noqa: F401
from data_check_spark.plans.suggest import (  # noqa: F401
    suggest_constraints,
    suggested_suite,
)
