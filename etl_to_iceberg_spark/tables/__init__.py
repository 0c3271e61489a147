"""Managed tables: snapshot log over parquet."""
