from data_check_spark.operators.schema_diff import schema_diff, common_columns  # noqa: F401
from data_check_spark.operators.stats import column_stats, partition_stats_verdicts  # noqa: F401
from data_check_spark.operators.unique import uniqueness_violations, uniqueness_check  # noqa: F401
from data_check_spark.operators.refint import referential_violations  # noqa: F401
from data_check_spark.operators.bloom import (  # noqa: F401
    KeyBloom,
    build_key_bloom,
    bloom_member_probe,
    referential_violations_bloom,
)
from data_check_spark.operators.rowdiff import (  # noqa: F401
    pk_census,
    exclusive_rows,
    column_match_ratios,
    row_diff,
)
from data_check_spark.operators.drift import (  # noqa: F401
    categorical_frequencies,
    psi_categorical,
    numeric_histogram,
    psi_numeric,
    ks_statistic,
)
from data_check_spark.operators.components import (  # noqa: F401
    connected_components,
    duplicate_clusters,
)
from data_check_spark.operators.lm import (  # noqa: F401
    bigram_lm,
    bigram_lm_scores,
    merge_bigram_lm,
    save_bigram_lm,
    load_bigram_lm,
)
from data_check_spark.operators.export import (  # noqa: F401
    shard_id,
    shard_manifest,
    export_shards,
    verify_export,
)
from data_check_spark.operators.mixing import (  # noqa: F401
    mix_plan,
    apply_mix,
    source_mix,
)
