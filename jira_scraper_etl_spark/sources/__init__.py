"""Custom Spark data sources (Python Data Source API)."""

from .jira_rest import (  # noqa: F401
    ISSUE_SCHEMA,
    JiraRestDataSource,
    SourceConfig,
    build_jql,
    fetch_page,
    issue_to_row,
    register_jira_source,
    synthetic_issue,
)
from . import offsets  # noqa: F401
