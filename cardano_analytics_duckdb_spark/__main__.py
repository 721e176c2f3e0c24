"""``python -m cardano_analytics_duckdb_spark`` — see cli.py."""

import sys

from .cli import main

sys.exit(main())
