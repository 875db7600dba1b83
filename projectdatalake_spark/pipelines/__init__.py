"""Pipelines: multi-table ETL DAGs built from the operator modules."""
