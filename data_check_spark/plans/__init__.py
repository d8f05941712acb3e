from data_check_spark.plans.suite import CheckSuite, SuiteResult  # noqa: F401
from data_check_spark.plans.manifest import Manifest  # noqa: F401
from data_check_spark.plans.audit import write_audit  # noqa: F401
