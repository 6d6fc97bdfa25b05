"""Sources and sinks: schema-checked readers + idempotent writers."""
