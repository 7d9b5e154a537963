"""FastAPI serving surface — endpoint parity with `serving/app.py:28-71`:
env-driven startup, POST /startup, GET /healthz, POST /recommend.
FastAPI import is gated so the core package has no serving dependencies.
"""
from __future__ import annotations

import os
from typing import List, Optional

from plotpointe_tpu.serving.runtime import RecommenderRuntime, ServingConfig


def create_app():
    from fastapi import FastAPI, HTTPException
    from pydantic import BaseModel

    app = FastAPI(title="plotpointe-tpu recommender")
    state = {"runtime": None}

    class StartupConfig(BaseModel):
        item_embeddings_uri: str
        item_index_map_uri: Optional[str] = None
        topk: int = 20
        project_id: Optional[str] = None

    class RecommendRequest(BaseModel):
        item_ids: List[int]
        k: Optional[int] = None

    @app.on_event("startup")
    def on_startup():
        uri = os.getenv("ITEM_EMBEDDINGS_URI")
        if not uri:
            return  # manual /startup path
        cfg = ServingConfig(
            item_embeddings_uri=uri,
            item_index_map_uri=os.getenv("ITEM_INDEX_MAP_URI"),
            topk=int(os.getenv("TOPK", "20")),
            project_id=os.getenv("PROJECT_ID", os.getenv("GOOGLE_CLOUD_PROJECT")),
        )
        rt = RecommenderRuntime(cfg)
        rt.startup()
        state["runtime"] = rt

    @app.post("/startup")
    def manual_start(cfg: StartupConfig):
        rt = RecommenderRuntime(ServingConfig(**cfg.dict()))
        rt.startup()
        state["runtime"] = rt
        return {"status": "ok"}

    @app.get("/healthz")
    def healthz():
        return {"status": "ok"}

    @app.post("/recommend")
    def recommend(req: RecommendRequest):
        rt = state["runtime"]
        if rt is None:
            raise HTTPException(status_code=503, detail="Model not loaded. Call /startup or set env.")
        if not req.item_ids:
            raise HTTPException(status_code=400, detail="item_ids required")
        idx, scores = rt.top_k_for_user_items(req.item_ids, k=req.k)
        return {"indices": idx.tolist(), "scores": [float(x) for x in scores.tolist()]}

    return app
