"""Structured Streaming readings of the batch operators (SURVEY §2.11,
§7 M4). The reference is pure batch; the engine adds the streaming
surface over the driver's ``events`` table."""
