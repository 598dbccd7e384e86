"""astarte_data_updater_plant_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``astarte-platform/astarte_data_updater_plant`` (an Elixir/OTP streaming
ingestion engine for the Astarte IoT platform) on Apache Spark:

- Structured Streaming + keyed state for the per-device dataflow
  (reference: ``lib/astarte_data_updater_plant/data_updater/impl.ex``).
- DataFrame/SQL for every storage-side query (reference:
  ``lib/astarte_data_updater_plant/data_updater/queries.ex``).
- A declared-query library (``plans.registry``) whose entries are each
  checked against a DuckDB oracle over the shared synthetic tables.
- Large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal columns) built on the same primitives.

Everything here is derived from public knowledge: the Apache Spark API
and the reference repository's observable behavior.
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep `import astarte_data_updater_plant_spark` cheap
    """Public API surface, resolved on first use.

    - get_spark:            tuned SparkSession factory
    - queries / oracle_sql: the declared-query registry
    - run_batch/run_stream: the ingest pipeline (keyed device state)
    - attach_sink:          stream -> partitioned storage tables
    - run_maintenance:      LWW compaction + TTL vacuum jobs
    - load_catalog/write_catalog: interface schema dimension tables
    """
    if name == "get_spark":
        from .session import get_spark

        return get_spark
    if name in ("queries", "oracle_sql"):
        from .plans.registry import oracle_sql_map, queries_map

        return queries_map if name == "queries" else oracle_sql_map
    if name in ("run_batch", "run_stream"):
        from .streaming import pipeline

        return getattr(pipeline, name)
    if name == "attach_sink":
        from .streaming.sinks import attach_sink

        return attach_sink
    if name == "run_maintenance":
        from .storage.jobs import run_maintenance

        return run_maintenance
    if name in ("load_catalog", "write_catalog", "fixture_interfaces"):
        from . import catalog

        return getattr(catalog, name)
    raise AttributeError(name)
