"""selium_spark: a PySpark-native engine with the capabilities of
seliumlabs/selium (streaming compute fabric), re-expressed Spark-first.

Layers (SURVEY.md §7.1):
- session:   tuned SparkSession factory
- catalog:   Atlas-equivalent URI registry + schema-hash gatekeeping
- schemas:   reference-derived StructTypes
- engine:    named-query lifecycle, Park/Drop semantics, loss metrics
- operators: the full §2 inventory + LLM-data-pipeline extensions
- streaming: replay/test harness utilities
"""

from .catalog import SchemaMismatchError, StreamCatalog, schema_hash  # noqa: F401
from .engine import Engine, QueryHandle  # noqa: F401
from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
