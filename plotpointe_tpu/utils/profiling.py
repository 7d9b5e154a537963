"""Profiling & speed-of-light accounting.

The reference has no tracer — only wall-clock throughput numbers persisted in
*_meta.json (SURVEY.md section 5). This module is the TPU replacement:
`jax.profiler` trace capture plus roofline ("speed-of-light") accounting for
the framework's hot kernels, so every bench can report achieved vs attainable.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Iterator, Optional

import jax

# v5e (v5 lite) per-chip peaks; override for other generations.
TPU_SPECS = {
    "v5e": {"bf16_tflops": 197.0, "f32_tflops": 49.0, "hbm_gbps": 819.0},
    "v5p": {"bf16_tflops": 459.0, "f32_tflops": 115.0, "hbm_gbps": 2765.0},
    "v4": {"bf16_tflops": 275.0, "f32_tflops": 69.0, "hbm_gbps": 1228.0},
    "cpu": {"bf16_tflops": 1.0, "f32_tflops": 1.0, "hbm_gbps": 50.0},
}


def detect_generation() -> str:
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN")
    if gen:
        return gen
    kind = str(jax.devices()[0].device_kind).lower()
    for g in ("v5p", "v5e", "v4"):
        if g in kind or (g == "v5e" and "v5 lite" in kind):
            return g
    return "cpu" if jax.default_backend() == "cpu" else "v5e"


@dataclass
class Roofline:
    """Achieved vs attainable for one kernel invocation."""

    name: str
    seconds: float
    flops: float = 0.0
    bytes_accessed: float = 0.0
    dtype_tflops_key: str = "bf16_tflops"

    def report(self, gen: Optional[str] = None) -> Dict:
        spec = TPU_SPECS[gen or detect_generation()]
        t_compute = self.flops / (spec[self.dtype_tflops_key] * 1e12) if self.flops else 0.0
        t_memory = self.bytes_accessed / (spec["hbm_gbps"] * 1e9) if self.bytes_accessed else 0.0
        bound = max(t_compute, t_memory)
        return {
            "kernel": self.name,
            "seconds": self.seconds,
            "achieved_tflops": self.flops / self.seconds / 1e12 if self.seconds else 0.0,
            "achieved_gbps": self.bytes_accessed / self.seconds / 1e9 if self.seconds else 0.0,
            "speed_of_light_s": bound,
            "sol_fraction": bound / self.seconds if self.seconds and bound else 0.0,
            "bound_by": "compute" if t_compute >= t_memory else "memory",
        }


@contextlib.contextmanager
def trace(log_dir: str = "tmp/jax_trace") -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_call(fn, *args, iters: int = 5, warmup: int = 1) -> float:
    """Median-free simple steady-state timing with block_until_ready."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
