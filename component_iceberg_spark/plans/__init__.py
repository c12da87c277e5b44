"""Query/operator registry package.

Importing :func:`load_all` pulls in every query-definition module so the
registry is fully populated. ``__spark_entry__.py``, the pytest oracle
harness, and ``bench.py`` all iterate the same registry — one inventory,
three consumers.
"""

from component_iceberg_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    EngineQuery,
    load_all,
    register,
)
