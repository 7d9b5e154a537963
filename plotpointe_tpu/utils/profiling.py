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
    """Achieved vs attainable for one kernel invocation.

    `measured_peaks`: optional {"tflops": float, "hbm_gbps": float} from
    measure_device_peaks(). sol_fraction_dev scores against what the device
    ACTUALLY delivers on a pure-stream / pure-matmul calibration loop; with
    the round-5 probes this device measures within ~3% of chip spec, so
    sol_fraction_dev ~= sol_fraction (earlier rounds' probes under-measured
    the peaks and inflated _dev)."""

    name: str
    seconds: float
    flops: float = 0.0
    bytes_accessed: float = 0.0
    dtype_tflops_key: str = "bf16_tflops"
    measured_peaks: Optional[Dict] = None

    def report(self, gen: Optional[str] = None) -> Dict:
        spec = TPU_SPECS[gen or detect_generation()]
        t_compute = self.flops / (spec[self.dtype_tflops_key] * 1e12) if self.flops else 0.0
        t_memory = self.bytes_accessed / (spec["hbm_gbps"] * 1e9) if self.bytes_accessed else 0.0
        bound = max(t_compute, t_memory)
        out = {
            "kernel": self.name,
            "seconds": self.seconds,
            "achieved_tflops": self.flops / self.seconds / 1e12 if self.seconds else 0.0,
            "achieved_gbps": self.bytes_accessed / self.seconds / 1e9 if self.seconds else 0.0,
            "speed_of_light_s": bound,
            "sol_fraction": bound / self.seconds if self.seconds and bound else 0.0,
            "bound_by": "compute" if t_compute >= t_memory else "memory",
        }
        if self.measured_peaks:
            tc = self.flops / (self.measured_peaks["tflops"] * 1e12) if self.flops else 0.0
            tm = self.bytes_accessed / (self.measured_peaks["hbm_gbps"] * 1e9) if self.bytes_accessed else 0.0
            b = max(tc, tm)
            out["sol_fraction_dev"] = b / self.seconds if self.seconds and b else 0.0
        return out


def _stream_probe_kernel(bm: int, dd: int):
    """Pallas read-stream body: max-reduce each [bm, dd] block to [8, 128].
    The tiny c operand threads the scan carry through so the loop-invariant
    streaming work cannot be hoisted out of the timing scan."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl  # noqa: F401

    def kernel(x_ref, c_ref, o_ref):
        m = jnp.max(x_ref[:].reshape(8, bm // 8, dd), axis=1)  # bf16 [8, dd]
        o_ref[:] = jnp.max(m.reshape(8, dd // 128, 128), axis=1).astype(jnp.float32) + c_ref[0, 0]

    return kernel


def measure_device_peaks(timed_inner=None) -> Dict:
    """Calibrate what THIS device actually delivers, scan-chained inside one
    jit: a bf16 4096x8192x4096 matmul loop (MXU ceiling) and a 256 MB bf16
    Pallas read-stream (HBM ceiling — a Pallas block stream, not an XLA
    reduce/flip, because those measured 79/326 GB/s where the same stream
    through Mosaic's pipelined block DMAs reaches ~797 GB/s = 97% of the v5e
    HBM spec; the kernels scored against this peak ARE Mosaic block
    streams). Both probes land within ~3% of chip spec here (192 TF bf16,
    797 GB/s), so sol_dev ~= sol.
    Returns {"tflops", "hbm_gbps"}."""
    import numpy as np

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if timed_inner is None:
        def timed_inner(body, *args, n_iter=8, n_rep=2):
            @jax.jit
            def run(c0, *a):
                c, _ = jax.lax.scan(lambda c, i: (body(c, i, *a), None), c0, jnp.arange(n_iter))
                return c

            float(jnp.ravel(run(jnp.float32(0.0), *args))[0])
            best = 1e9
            for _ in range(n_rep):
                t = time.perf_counter()
                float(jnp.ravel(run(jnp.float32(0.0), *args))[0])
                best = min(best, time.perf_counter() - t)
            return best / n_iter

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(4096, 8192)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(8192, 4096)).astype(np.float32)).astype(jnp.bfloat16)

    def mm_body(c, i, a, b):
        # the a+c pass adds ~128 MB of HBM traffic (~10% underestimate of the
        # MXU peak) but pins the matmul inside the scan
        y = jnp.dot(a + c.astype(jnp.bfloat16), b, preferred_element_type=jnp.bfloat16)
        # full-sum carry: a sliced y[0, 0] lets XLA rewrite the dot to a
        # single row x column product (measured "3500 TFLOP/s")
        return c + jnp.sum(y.astype(jnp.float32)) * 1e-12

    dt_mm = timed_inner(mm_body, a, b)
    del a, b

    M, D, BM = 32 * 1024, 4096, 512  # 256 MB bf16, 4 MB blocks (2x buffered)
    x = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32)).astype(jnp.bfloat16)
    on_cpu = jax.default_backend() == "cpu"

    def stream_body(c, i, x):
        cb = jnp.full((8, 128), c, jnp.float32)
        o = pl.pallas_call(
            _stream_probe_kernel(BM, D),
            grid=(M // BM,),
            in_specs=[pl.BlockSpec((BM, D), lambda g: (g, 0)),
                      pl.BlockSpec((8, 128), lambda g: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((M // BM * 8, 128), jnp.float32),
            interpret=on_cpu,
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        )(x, cb)
        return c + o[0, 0] * 1e-9

    if on_cpu:  # interpret-mode stream is meaningless; keep the cheap flip
        def stream_body(c, i, x):  # noqa: F811
            return c + jnp.max(x.astype(jnp.float32) + c) * 1e-9

    dt_stream = timed_inner(stream_body, x, n_iter=4, n_rep=3)  # best-of-3:
    # the shared tunnel's delivered bandwidth varies run to run
    return {
        "tflops": 2 * 4096 * 4096 * 8192 / dt_mm / 1e12,
        "hbm_gbps": M * D * 2 / dt_stream / 1e9,
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
