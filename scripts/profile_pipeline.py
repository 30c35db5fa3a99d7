"""Per-cut timing profile of the mapping pipeline (diagnostic)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metasra_pipeline_spark.session import get_spark
from metasra_pipeline_spark import ops

N = int(os.environ.get("PROF_DOCS", "1000"))

spark = get_spark("profile", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark.sparkContext.setLogLevel("ERROR")

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


@F.pandas_udf(LongType())
def _warm(x: pd.Series) -> pd.Series:
    return x


spark.range(0, 64 * 1000, 1, 64).select(F.sum(_warm("id"))).collect()

from metasra_pipeline_spark.datagen import synth_documents
from metasra_pipeline_spark.plans.pipeline import run_mapping_pipeline
from metasra_pipeline_spark.refdata import load_refdata

ref = load_refdata(spark)
docs = (synth_documents(spark, N, seed=42)
        .select("doc_id", "spans").localCheckpoint(eager=True))


class TimedSnap(ops.LocalSnapshotter):
    def __init__(self):
        super().__init__()
        self.t_last = time.time()

    def cut(self, df, name):
        t0 = time.time()
        out = super().cut(df, name)
        t1 = time.time()
        print(f"  cut {name:<14} eval={t1 - t0:7.2f}s  since_prev={t0 - self.t_last:6.2f}s",
              flush=True)
        self.t_last = t1
        return out


t0 = time.time()
snap = TimedSnap()
res = run_mapping_pipeline(spark, docs, ref, snap=snap)
t1 = time.time()
print(f"plan build+cuts: {t1 - t0:.2f}s", flush=True)
res.mapped_terms.write.format("noop").mode("overwrite").save()
t2 = time.time()
print(f"consolidate tail: {t2 - t1:.2f}s", flush=True)
print(f"TOTAL: {t2 - t0:.2f}s")
