"""Why does ANY token metric cost ~59us/row inside the fused stats agg?
Matrix: expression x aggregate-mode. Usage: spark-submit ... <cores> <pages>
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    spark = (
        SparkSession.builder.appName(f"dcs-tok-{cores}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(pages_path).withColumn("warc_day", F.to_date("warc_ts"))
    p = F.col("warc_day").cast("string")
    c = F.col("text")
    trimmed = F.trim(c)
    tok_tr = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.length(trimmed) - F.length(F.translate(trimmed, " \t\n\r\f", "")) + F.lit(1))
    tok_re = F.regexp_count(c, F.lit(r"\S+"))
    df.count()

    def tm(name, frame):
        t0 = time.perf_counter()
        frame.collect()
        print(json.dumps({name: round(time.perf_counter() - t0, 2)}), flush=True)

    g = df.groupBy(p.alias("p"))
    tm("avg_len", g.agg(F.avg(F.length(c))))
    # tm("avg_tok_translate", g.agg(F.avg(tok_tr)))
    # tm("avg_tok_regex", g.agg(F.avg(tok_re)))
    # tm("avg_tok_translate_plus_hll", g.agg(F.avg(tok_tr), F.approx_count_distinct("lang")))
    tm("avg_len_plus_hll", g.agg(F.avg(F.length(c)), F.approx_count_distinct("lang")))
    # tm("precompute_tok_then_agg", df.select(p.alias("p"), tok_tr.alias("t"), "lang")
    #    .groupBy("p").agg(F.avg("t"), F.approx_count_distinct("lang")))
    tok_rp = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.length(trimmed) - F.length(F.replace(trimmed, F.lit(" "), F.lit(""))) + F.lit(1))
    tm("avg_tok_replace", g.agg(F.avg(tok_rp)))
    tm("avg_tok_split", g.agg(F.avg(F.size(F.split(trimmed, " ")))))
    b = F.greatest(F.lit(0), F.least(F.lit(49), F.floor(F.length(c).cast("double") / F.lit(100.0)).cast("int")))
    tm("hist_countif_real", df.select(p.alias("p"), b.alias("b")).groupBy("p").agg(
        F.array(*[F.count_if(F.col("b") == i) for i in range(50)])))
    tm("hist_2key_real", df.groupBy(p.alias("p"), b.alias("b")).agg(F.count(F.lit(1))))
    spark.stop()


if __name__ == "__main__":
    main()
# appended variants live in main() via edit below
