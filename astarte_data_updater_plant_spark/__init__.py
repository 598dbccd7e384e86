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
