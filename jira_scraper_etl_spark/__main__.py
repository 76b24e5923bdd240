"""``python -m jira_scraper_etl_spark`` — see cli.py."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
