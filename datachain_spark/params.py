"""Query parameters (reference src/datachain/query/params.py:1-26).

`param(key, default)` reads the JSON object in $DATACHAIN_SPARK_QUERY_PARAMS
once per process and serves lookups from the cache — the mechanism the
reference uses to parameterize a saved query script from the job runner.
"""

from __future__ import annotations

import json
import os

_params_cache: dict[str, str] | None = None

PARAMS_ENV = "DATACHAIN_SPARK_QUERY_PARAMS"


def param(key: str, default: str | None = None) -> str | None:
    """Get a query parameter (reference params.py:7-26: string keys only,
    env payload must be a JSON object, parsed once and cached)."""
    if not isinstance(key, str):
        raise TypeError("Param key must be a string")
    global _params_cache
    if _params_cache is None:
        env_params = os.getenv(PARAMS_ENV)
        if env_params:
            try:
                parsed = json.loads(env_params)
            except (TypeError, ValueError):
                raise ValueError("Invalid params provided") from None
            if not isinstance(parsed, dict):
                raise ValueError("Invalid params provided")
            _params_cache = parsed
        else:
            _params_cache = {}
    return _params_cache.get(key, default)


def _reset_params_cache() -> None:
    """Test hook: force a re-read of the env on next param()."""
    global _params_cache
    _params_cache = None
