"""Incremental ingestion (Structured Streaming, Trigger.AvailableNow)."""
