"""End-to-end extraction pipelines (the engine's "query plans")."""
