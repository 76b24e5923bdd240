"""Data sources: the paginated REST (Jira) source, checkpoint store, and
file-format helpers."""
