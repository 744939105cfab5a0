"""priority_data_pipeline_postgres_db_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference ELT service
``talc87/priority_data_pipeline_postgres_db`` (an OData → Postgres staging
loader) as an idiomatic Spark engine:

- control plane (extraction configs, schema registry, EDM type map,
  watermarks) as plain JSON-backed tables instead of MongoDB
  (``sources.control``),
- an OData-shaped source with ``$filter`` / ``$top`` pushdown and paginated
  partitioned reads built on the Spark Python DataSource API
  (``sources.odata``),
- the reference's operator inventory (SURVEY.md §2) as composable DataFrame
  functions (``operators.ingest``, ``operators.staging``),
- the catalog / DDL lifecycle (``plans.catalog``) and the three entry-point
  pipelines (``plans.pipeline``),
- beyond-reference, scale-oriented operators for LLM-data pipelines:
  deduplication, similarity search, text analysis, multimodal plumbing
  (``operators.dedup``, ``operators.similarity``, ``functions.text``,
  ``operators.multimodal``).

Everything is DataFrame-first: logical plans are declared with the DataFrame
API and Catalyst picks the physical strategy.  Python UDFs appear only where
built-ins cannot express the semantics, and then always Arrow-batched.
"""

__version__ = "0.1.0"
