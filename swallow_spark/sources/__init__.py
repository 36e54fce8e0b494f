"""Custom connectors (SURVEY.md §2.A): Spark-4 Python DataSource
implementations — the engine's analog of the reference's pluggable
reader/writer adapters (ES/CSV/JSON/Rabbit/Mongo)."""
