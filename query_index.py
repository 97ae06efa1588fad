#!/usr/bin/env python
"""spark-submit entry: BM25 top-k query against a published index.

    spark-submit --py-files mee_spark.zip query_index.py \
        --index <index dir> --query "spark query engine" --k 10
"""

import sys

from mee_spark.cli import main

if __name__ == "__main__":
    main(["query", *sys.argv[1:]])
