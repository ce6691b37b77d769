#!/usr/bin/env python
"""Z-order layout experiment: 2-D range predicates over flat vs
linear-sorted vs z-ordered lineitem layouts.

Builds three parquet copies of a scaled lineitem (reuses the
tpch_scale_stress output if present), each with small row groups so
min/max pruning granularity is visible, then measures:

1. ROW-GROUP SKIP FRACTION — read every footer with pyarrow and count
   row groups whose [min, max] box intersects the predicate box (the
   deterministic metric parquet pruning actually uses);
2. scan wall for a filtered aggregate on each layout.

Usage: zorder_experiment.py [FACT_DIR] (default /tmp/tpch10x)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FACT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpch10x"
OUT = "/tmp/zorder_exp"
ROW_GROUP_BYTES = 1 << 20  # small groups -> visible pruning granularity

# the 2-D predicate box: ~5% of parts x ~5% of the shipdate range.
# Dates are materialized as integer days-since-1990 in the written
# layouts: parquet writes no min/max stats for the timestamp_ntz column
# here, and the pruning metric needs stats on BOTH dimensions.
PART_LO, PART_HI = 500, 600
DAY_LO, DAY_HI = 2557, 2647  # 1997-01-01 .. 1997-04-01


def main() -> None:
    from pyspark.sql import functions as F

    from mapreduce_weather_analysis_spark.functions.zorder import zvalue2
    from mapreduce_weather_analysis_spark.session import get_spark

    spark = get_spark(app_name="zorder-exp")
    for k in ("parquet.block.size", "dfs.blocksize"):
        spark.sparkContext._jsc.hadoopConfiguration().setInt(
            k, ROW_GROUP_BYTES
        )

    li = spark.read.parquet(f"{FACT}/lineitem.parquet")
    n = li.count()
    print(f"rows: {n}")

    li = li.withColumn(
        "days",
        F.datediff(
            F.col("l_shipdate"), F.lit("1990-01-01").cast("date")
        ).cast("int"),
    )
    layouts = {
        # repartition(1 key) would collapse parallelism; range-partition on
        # the ordering key then sort within partitions — the standard
        # cluster-write recipe for all four
        "flat": li.repartition(32),
        "sorted_date": li.repartitionByRange(32, "days")
        .sortWithinPartitions("days"),
        "sorted_part": li.repartitionByRange(32, "l_partkey")
        .sortWithinPartitions("l_partkey"),
        "zorder": li.withColumn("z", zvalue2(F.col("l_partkey"), F.col("days")))
        .repartitionByRange(32, "z")
        .sortWithinPartitions("z")
        .drop("z"),
    }
    for name, df in layouts.items():
        path = f"{OUT}/{name}"
        df.write.mode("overwrite").parquet(path)
        print(f"wrote {name}")

    import pyarrow.parquet as pq

    SHAPES = {
        # the three query shapes a 2-D layout must serve:
        "part+date box": (True, True),
        "part only": (True, False),
        "date only": (False, True),
    }

    def skip_fraction(path: str, use_part: bool, use_date: bool):
        total = hit = 0
        for f in Path(path).glob("*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            for rg in range(md.num_row_groups):
                total += 1
                g = md.row_group(rg)
                ps = g.column(idx["l_partkey"]).statistics
                ds = g.column(idx["days"]).statistics
                over = True
                if use_part:
                    over &= ps.min <= PART_HI and ps.max >= PART_LO
                if use_date:
                    over &= ds.min <= DAY_HI and ds.max >= DAY_LO
                if over:
                    hit += 1
        return hit, total

    for name in layouts:
        path = f"{OUT}/{name}"
        df = spark.read.parquet(path)
        cells = []
        for shape, (use_part, use_date) in SHAPES.items():
            hit, total = skip_fraction(path, use_part, use_date)
            cond = F.lit(True)
            if use_part:
                cond = cond & F.col("l_partkey").between(PART_LO, PART_HI)
            if use_date:
                cond = cond & F.col("days").between(DAY_LO, DAY_HI)
            q = df.where(cond).agg(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            )
            q.collect()  # warm
            t0 = time.perf_counter()
            q.collect()
            wall = time.perf_counter() - t0
            cells.append(f"{shape}: {hit}/{total} ({hit/total:.0%}) {wall:.2f}s")
        print(f"{name}:  " + "  |  ".join(cells))


if __name__ == "__main__":
    main()
