"""Optional HTTP surface (reference S12: api/routes/* — FastAPI NDJSON
streaming of entity/statement query results and bulk journal writes).

FastAPI is not available in this environment, so the app factory is
gated behind an import-try; the handler bodies are real and use
``toLocalIterator`` so result sets stream from executors without
materializing on the driver (the pattern SURVEY §2.1 S12 prescribes).
"""

from __future__ import annotations

import json

try:
    from fastapi import FastAPI
    from fastapi.responses import StreamingResponse

    HAVE_FASTAPI = True
except ImportError:  # pragma: no cover - not installed in this env
    FastAPI = None  # type: ignore[assignment]
    StreamingResponse = None  # type: ignore[assignment]
    HAVE_FASTAPI = False


def create_app(lakehouse):
    """Build the NDJSON API app over a :class:`Lakehouse`. Raises if
    FastAPI is unavailable."""
    if not HAVE_FASTAPI:
        raise NotImplementedError(
            "fastapi is not installed; the API surface requires it"
        )

    app = FastAPI(title="ftm-lakehouse-spark")

    def ndjson(df):
        def gen():
            for line in df.toJSON().toLocalIterator():
                yield line + "\n"

        return StreamingResponse(gen(), media_type="application/x-ndjson")

    @app.get("/{dataset}/entities")
    def entities(dataset: str, schema: str | None = None, limit: int = 100):
        from ftm_lakehouse_spark.plans.query import Query

        q = Query()
        if schema:
            q = q.where(schema=schema)
        q = q[0:limit]
        return ndjson(lakehouse.dataset(dataset).entities(q))

    @app.get("/{dataset}/statements")
    def statements(dataset: str, origin: str | None = None, limit: int = 1000):
        from ftm_lakehouse_spark.plans.query import Query

        q = Query()
        if origin:
            q = q.where(origin=origin)
        return ndjson(lakehouse.dataset(dataset).statements(q).limit(limit))

    @app.get("/{dataset}/entities/{entity_id}")
    def get_entity(dataset: str, entity_id: str):
        ent = lakehouse.dataset(dataset).get(entity_id)
        return json.loads(json.dumps(ent, default=str)) if ent else None

    @app.get("/{dataset}/stats")
    def stats(dataset: str):
        return lakehouse.dataset(dataset).stats()

    return app
