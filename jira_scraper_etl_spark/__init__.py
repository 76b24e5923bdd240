"""jira_scraper_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ETL pipeline (kunal29july/Jira-Scraper-ETL):
an incremental paginated-REST source with checkpointed resumption, a
columnar text-cleaning / derived-task transform layer, warn-don't-drop
validation, and a scheduled-worker analog — plus the relational query
surface (joins / aggregations / windows / set ops / event-time windows)
and LLM-training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) required for 100 TB-scale pipelines.

Everything is DataFrame-native: logical plans are declared with the
DataFrame / SQL API and optimized by Catalyst; Python UDFs are avoided in
hot paths (Arrow-batched pandas UDFs only where semantics genuinely
require imperative code).
"""

__version__ = "0.1.0"
