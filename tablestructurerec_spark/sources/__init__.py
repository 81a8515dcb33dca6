"""Sources and sinks: transcript readers, the synthetic generator, writers."""
