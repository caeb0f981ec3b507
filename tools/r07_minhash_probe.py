"""r07 probe: where does dedup_minhash_{lsh,prod} time go? (noop-sink
isolation per optimization guide §1.4). Throwaway measurement tool."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")

from pdf_inspector_spark.operators import dedup, load_views
from pdf_inspector_spark.operators.dedup import (
    _DOCS, _RECRAWL, N_BANDS, PROD_BANDS, PROD_ROWS, ROWS_PER_BAND,
    _cpu_fanout, bands_chain_spark, bands_df, candidate_pairs)
from pdf_inspector_spark.session import get_spark

spark = get_spark("probe", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
load_views(spark, SF_DIR)
fanout = _cpu_fanout(spark)


def t(label, thunk, n=2):
    thunk()  # warm
    best = min(min_t(thunk) for _ in range(n))
    print(f"{label}: {best:.3f}")
    return best


def min_t(thunk):
    t0 = time.monotonic()
    thunk()
    return time.monotonic() - t0


def noop(df):
    df.write.format("noop").mode("overwrite").save()


for label, corpus, nb, rpb in (("lsh", _DOCS, N_BANDS, ROWS_PER_BAND),
                               ("prod", _RECRAWL, PROD_BANDS, PROD_ROWS)):
    chain = bands_chain_spark(corpus, nb, rpb, fanout=fanout)
    # stage slices
    t(f"{label} reps only",
      lambda: noop(spark.sql(f"WITH {chain} SELECT * FROM reps")))
    t(f"{label} shingles (sh)",
      lambda: noop(spark.sql(f"WITH {chain} SELECT doc_id, size(shingles) FROM sh")))
    t(f"{label} hashes (hs)",
      lambda: noop(spark.sql(f"WITH {chain} SELECT doc_id, h FROM hs")))
    t(f"{label} minhash (mh)",
      lambda: noop(spark.sql(f"WITH {chain} SELECT doc_id, mins FROM mh")))
    t(f"{label} bands0",
      lambda: noop(spark.sql(f"WITH {chain} SELECT * FROM bands0")))
    t(f"{label} buckets",
      lambda: noop(spark.sql(f"WITH {chain} SELECT * FROM buckets")))
    t(f"{label} bands (exploded)",
      lambda: noop(spark.sql(f"WITH {chain} SELECT * FROM bands")))
    t(f"{label} full (pairs+distinct+orderBy)",
      lambda: dedup.candidate_pairs_df(spark, SF_DIR, corpus, nb,
                                       rpb).orderBy(
          "doc_a", "doc_b").count())
spark.stop()
