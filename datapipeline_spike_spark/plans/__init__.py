"""Driver-facing query catalog: every implemented operator from
SURVEY.md §2 is registered here as (Spark callable, DuckDB oracle SQL).
``__spark_entry__`` at the repo root re-exports this registry."""

from datapipeline_spike_spark.plans.registry import REGISTRY, EngineQuery, register  # noqa: F401
from datapipeline_spike_spark.plans import catalog  # noqa: F401  (populates REGISTRY)
from datapipeline_spike_spark.plans import catalog_relational  # noqa: F401
from datapipeline_spike_spark.plans import catalog_events  # noqa: F401
from datapipeline_spike_spark.plans import catalog_extensions  # noqa: F401
from datapipeline_spike_spark.plans import catalog_ml  # noqa: F401
