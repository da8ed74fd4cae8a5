"""Aggregated query registry. Importing this package registers every
query module's entries into ``registry.REGISTRY``."""

from __future__ import annotations

from . import analytics_queries  # noqa: F401
from . import core_queries  # noqa: F401
from . import crossmodal_queries  # noqa: F401
from . import curation_queries  # noqa: F401
from . import multimodal_queries  # noqa: F401
from . import sql_surface_queries  # noqa: F401
from . import temporal_queries  # noqa: F401
from . import text_queries  # noqa: F401
from . import vector_queries  # noqa: F401
from .registry import REGISTRY, oracle_sql, queries

__all__ = ["REGISTRY", "queries", "oracle_sql"]
