"""``python -m crawler_spark`` → the spark-submit CLI (crawler_spark.cli)."""

import sys

from crawler_spark.cli import main

sys.exit(main())
