from plotpointe_tpu.serving.runtime import RecommenderRuntime, ServingConfig

__all__ = ["RecommenderRuntime", "ServingConfig"]
