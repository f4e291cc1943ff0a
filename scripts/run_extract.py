"""spark-submit entry script (thin shim over the package CLI).

spark-submit provides the SparkSession config/master; the CLI builds the
session via getOrCreate so submit-provided conf wins.
"""

from __future__ import annotations

import sys

from ner_ocr_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(["extract", *sys.argv[1:]]))
