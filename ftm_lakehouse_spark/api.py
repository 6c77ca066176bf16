"""HTTP surface (reference S12: api/routes/* — FastAPI NDJSON streaming
of entity/statement query results and bulk journal writes,
api/routes/entities.py:34-93).

Split in two layers so the logic is testable in environments without
fastapi (this one):

* :class:`NdjsonApi` — framework-free route handlers. Reads stream via
  ``toLocalIterator`` (results never materialize on the driver, the
  pattern SURVEY §2.1 S12 prescribes); writes accept an iterable of
  NDJSON lines like the reference's bulk journal endpoint.
* :func:`create_app` — a thin FastAPI adapter over it, import-guarded.

DoS caps (reference api/dependencies.py:78-167 clamps limit/offset):
``limit`` is clamped to ``MAX_LIMIT`` before the query is built.
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator

#: reference clamps page sizes before touching the store
MAX_LIMIT = 10_000

try:
    from fastapi import FastAPI
    from fastapi.responses import StreamingResponse

    HAVE_FASTAPI = True
except ImportError:  # pragma: no cover - not installed in this env
    FastAPI = None  # type: ignore[assignment]
    StreamingResponse = None  # type: ignore[assignment]
    HAVE_FASTAPI = False


class NdjsonApi:
    """Framework-free handlers over a :class:`Lakehouse`. Every reader
    returns an iterator of NDJSON lines (newline included) so any
    transport — FastAPI StreamingResponse, a test harness, a CLI pipe —
    can drain it without buffering the result set."""

    def __init__(self, lakehouse):
        self.lakehouse = lakehouse

    @staticmethod
    def _ndjson(df) -> Iterator[str]:
        for line in df.toJSON().toLocalIterator():
            yield line + "\n"

    @staticmethod
    def _clamp(limit: int) -> int:
        return max(0, min(int(limit), MAX_LIMIT))

    def entities(
        self, dataset: str, schema: str | None = None, limit: int = 100
    ) -> Iterator[str]:
        from ftm_lakehouse_spark.plans.query import Query

        q = Query()
        if schema:
            q = q.where(schema=schema)
        q = q[0 : self._clamp(limit)]
        return self._ndjson(self.lakehouse.dataset(dataset).entities(q))

    def statements(
        self, dataset: str, origin: str | None = None, limit: int = 1000
    ) -> Iterator[str]:
        from ftm_lakehouse_spark.plans.query import Query

        q = Query()
        if origin:
            q = q.where(origin=origin)
        df = self.lakehouse.dataset(dataset).statements(q).limit(self._clamp(limit))
        return self._ndjson(df)

    def get_entity(self, dataset: str, entity_id: str) -> dict | None:
        ent = self.lakehouse.dataset(dataset).get(entity_id)
        return json.loads(json.dumps(ent, default=str)) if ent else None

    def stats(self, dataset: str) -> dict:
        return self.lakehouse.dataset(dataset).stats()

    def write_entities(
        self, dataset: str, lines: Iterable[str], origin: str = "default"
    ) -> dict:
        """Bulk journal write: NDJSON entity lines → exploded statement
        rows (reference api/routes/entities.py bulk endpoint). Malformed
        lines are counted and skipped, like the reference's flush loop
        logging MalformedStatementError rows instead of aborting."""
        from ftm_lakehouse_spark.operators.explode import ENTITY_SCHEMA

        ok, bad = [], 0
        for line in lines:
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
                if not obj.get("id") or not obj.get("schema"):
                    raise ValueError("entity needs id and schema")
                ok.append(obj)
            except (json.JSONDecodeError, ValueError):
                bad += 1
        if ok:
            spark = self.lakehouse.spark
            df = spark.createDataFrame(
                [
                    {
                        "id": o["id"],
                        "caption": o.get("caption"),
                        "schema": o["schema"],
                        "properties": o.get("properties") or {},
                        "referents": o.get("referents") or [],
                        "datasets": o.get("datasets") or [],
                        "first_seen": o.get("first_seen"),
                        "last_seen": o.get("last_seen"),
                        "last_change": o.get("last_change"),
                        "origin": o.get("origin") or [],
                    }
                    for o in ok
                ],
                ENTITY_SCHEMA,
            )
            self.lakehouse.dataset(dataset).write_entities(df, origin=origin)
        return {"accepted": len(ok), "rejected": bad}


def create_app(lakehouse):
    """FastAPI adapter over :class:`NdjsonApi`. Raises if FastAPI is
    unavailable (the handlers themselves stay testable without it)."""
    if not HAVE_FASTAPI:
        raise NotImplementedError(
            "fastapi is not installed; the API surface requires it"
        )

    api = NdjsonApi(lakehouse)
    app = FastAPI(title="ftm-lakehouse-spark")

    def stream(it):
        return StreamingResponse(it, media_type="application/x-ndjson")

    @app.get("/{dataset}/entities")
    def entities(dataset: str, schema: str | None = None, limit: int = 100):
        return stream(api.entities(dataset, schema=schema, limit=limit))

    @app.get("/{dataset}/statements")
    def statements(dataset: str, origin: str | None = None, limit: int = 1000):
        return stream(api.statements(dataset, origin=origin, limit=limit))

    @app.get("/{dataset}/entities/{entity_id}")
    def get_entity(dataset: str, entity_id: str):
        return api.get_entity(dataset, entity_id)

    @app.get("/{dataset}/stats")
    def stats(dataset: str):
        return api.stats(dataset)

    @app.post("/{dataset}/entities")
    async def write_entities(dataset: str, request):  # pragma: no cover
        body = await request.body()
        return api.write_entities(dataset, body.decode("utf-8").splitlines())

    return app
