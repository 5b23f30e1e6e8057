"""Fast JSON line parsing with best-available backend (ujson > orjson > json)."""
from __future__ import annotations

try:  # pragma: no cover - depends on environment
    import orjson as _orjson

    def json_loads(b):
        return _orjson.loads(b)

except ImportError:  # pragma: no cover
    try:
        import ujson as _ujson

        def json_loads(b):
            if isinstance(b, (bytes, bytearray)):
                b = b.decode("utf-8")
            return _ujson.loads(b)

    except ImportError:
        import json as _json

        def json_loads(b):
            if isinstance(b, (bytes, bytearray)):
                b = b.decode("utf-8")
            return _json.loads(b)
