"""`python -m plotpointe_tpu.serving` — env-driven stdlib serving entrypoint
(container CMD; mirrors the reference's uvicorn serving.app entry)."""
import os

from plotpointe_tpu.serving.httpd import serve
from plotpointe_tpu.serving.runtime import RecommenderRuntime, ServingConfig


def main():
    rt = None
    uri = os.environ.get("ITEM_EMBEDDINGS_URI")
    if uri:
        rt = RecommenderRuntime(
            ServingConfig(
                item_embeddings_uri=uri,
                item_index_map_uri=os.environ.get("ITEM_INDEX_MAP_URI"),
                topk=int(os.environ.get("TOPK", "20")),
                use_device=os.environ.get("SERVING_USE_DEVICE", "0") == "1",
            )
        )
        rt.startup()
    telemetry = None
    tel_dir = os.environ.get("TELEMETRY_DIR")
    if tel_dir:
        from plotpointe_tpu.serving.telemetry import ServingTelemetry

        telemetry = ServingTelemetry(root=tel_dir)
    host = os.environ.get("HOST", "0.0.0.0")
    port = int(os.environ.get("PORT", "8080"))
    print(f"serving on {host}:{port} loaded={rt is not None} telemetry={telemetry is not None}", flush=True)
    serve(host, port, runtime=rt, telemetry=telemetry, block=True)


if __name__ == "__main__":
    main()
