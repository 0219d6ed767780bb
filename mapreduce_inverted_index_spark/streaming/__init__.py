"""Structured Streaming operators (windows, watermarks, sessionization)."""
