from data_check_spark.sources.synth import (  # noqa: F401
    synth_domains,
    synth_pages,
    synth_pages_v2,
)
from data_check_spark.sources.readers import load_tables  # noqa: F401
