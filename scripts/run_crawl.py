#!/usr/bin/env python
"""Thin spark-submit driver script: ship the package with
``--py-files dist/crawler_spark.zip`` and run this file.

    spark-submit --master local[8] --py-files dist/crawler_spark.zip \
        scripts/run_crawl.py --pages ... --seeds ... --ckpt ... --out ...
"""

import sys

from crawler_spark.cli import main

sys.exit(main())
