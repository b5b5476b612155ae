"""``python -m pride_spark`` entry point."""

import sys

from pride_spark.cli import main

sys.exit(main())
