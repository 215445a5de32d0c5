"""Reference-parity layer: the MambaETL-shaped clinical schema and the
reference's line-list reports re-expressed as Spark DataFrame pipelines
(SURVEY.md §1/§2; /root/reference/sql_queries/)."""
