"""FastAPI transport over the shared serving endpoints.

Route surface matches the reference API contract (`serving/app.py:51-71`):
GET /healthz, POST /startup, POST /recommend — plus this framework's
POST /feedback telemetry extension. All request handling lives in
serving/endpoints.ServingState; this module only adapts it to FastAPI
(pydantic request models, HTTPException on non-200). The import is gated so
the core package carries no serving dependencies — environments without
fastapi use the stdlib transport (serving/httpd.py) instead.
"""
from __future__ import annotations

from typing import List, Optional

from plotpointe_tpu.serving.endpoints import ServingState


def create_app(telemetry=None):
    from fastapi import FastAPI, HTTPException
    from pydantic import BaseModel

    state = ServingState(telemetry=telemetry)
    app = FastAPI(title="plotpointe-tpu recommender")

    class StartupBody(BaseModel):
        item_embeddings_uri: str
        item_index_map_uri: Optional[str] = None
        topk: int = 20
        project_id: Optional[str] = None
        use_device: bool = True

    class RecommendBody(BaseModel):
        item_ids: List[int]
        k: Optional[int] = None
        user_key: Optional[str] = None

    class FeedbackBody(BaseModel):
        request_id: str
        item_id: int
        event_type: str = "click"
        value: float = 1.0
        user_key: Optional[str] = None

    def unwrap(reply):
        code, body = reply
        if code != 200:
            raise HTTPException(status_code=code, detail=body.get("detail", "error"))
        return body

    @app.on_event("startup")
    def _bootstrap():
        state.startup_from_env()

    @app.get("/healthz")
    def healthz():
        return unwrap(state.healthz())

    @app.post("/startup")
    def startup(body: StartupBody):
        return unwrap(state.startup(body.dict()))

    @app.post("/recommend")
    def recommend(body: RecommendBody):
        return unwrap(state.recommend(body.dict()))

    @app.post("/feedback")
    def feedback(body: FeedbackBody):
        return unwrap(state.feedback(body.dict()))

    return app
