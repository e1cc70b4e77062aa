"""`python -m pttcrawler_spark` — the `python -m crawler` analog
(/root/reference/crawler/__main__.py:57-78)."""

import sys

from .cli import main

sys.exit(main())
