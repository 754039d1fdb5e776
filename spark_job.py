"""spark-submit entry point (north-rule deployment shape):

    python tools/make_pyfiles.py dist/tilekiln_spark.zip
    spark-submit --master <cluster> --py-files dist/tilekiln_spark.zip \
        spark_job.py generate zooms --config cfg.yaml --store s3://... \
        --min-zoom 0 --max-zoom 14

The CLI builds its SparkSession with getOrCreate(), so master/executor/conf
all come from spark-submit; the zip puts tilekiln_spark on every executor's
PYTHONPATH (required by the Arrow/pandas UDF kernels, which unpickle on the
executors).  Subcommands are tilekiln_spark.cli's (config/generate/storage) —
the reference CLI surface (reference tilekiln/main.py:25-32).
"""

import sys

from tilekiln_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
