"""Capture .explain("formatted") for named queries into a directory.

Usage: python tools/capture_plans.py OUTDIR SUFFIX name [name ...]
Writes OUTDIR/<name>_<SUFFIX>.txt. Run from any checkout; the repo on
sys.path[0] (this file's parent's parent) is the code being captured.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_dag_spark.session import get_spark, quiet_benign_logs

    spark = get_spark(app_name="capture-plans", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    quiet_benign_logs(spark)

    from etl_dag_spark.operators.hierarchy import release_persisted
    from etl_dag_spark.queries import SPARK_QUERIES

    for name in names:
        df = SPARK_QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        release_persisted()
        print(f"captured {name}_{suffix}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
