"""Spark integration: sessions, the extraction+match job, metrics, resume."""
