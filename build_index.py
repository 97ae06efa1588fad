#!/usr/bin/env python
"""spark-submit entry: full/incremental index build.

    spark-submit --py-files mee_spark.zip build_index.py \
        --pages <parquet/iceberg path> --index <index dir> [--incremental]
"""

import sys

from mee_spark.cli import main

if __name__ == "__main__":
    main(["build", *sys.argv[1:]])
