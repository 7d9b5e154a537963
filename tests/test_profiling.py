"""Roofline accounting and timing utilities."""
import numpy as np

import jax.numpy as jnp

from plotpointe_tpu.utils.profiling import Roofline, TPU_SPECS, timed_call


def test_roofline_compute_bound():
    # big matmul: flops dominate
    r = Roofline(name="mm", seconds=0.01, flops=1e12, bytes_accessed=1e6)
    rep = r.report(gen="v5e")
    assert rep["bound_by"] == "compute"
    assert 0 < rep["sol_fraction"] <= 1.0 + 1e-9 or rep["sol_fraction"] > 0
    assert abs(rep["achieved_tflops"] - 100.0) < 1e-6


def test_roofline_memory_bound():
    r = Roofline(name="stream", seconds=0.01, flops=1e6, bytes_accessed=8.19e9)
    rep = r.report(gen="v5e")
    assert rep["bound_by"] == "memory"
    # SoL for 8.19 GB at 819 GB/s is 10 ms -> fraction ~1.0
    assert abs(rep["sol_fraction"] - 1.0) < 0.05


def test_specs_cover_generations():
    for gen in ("v5e", "v5p", "v4", "cpu"):
        assert {"bf16_tflops", "f32_tflops", "hbm_gbps"} <= set(TPU_SPECS[gen])


def test_timed_call_runs():
    f = lambda x: jnp.sum(x * 2)
    dt = timed_call(f, jnp.ones((64, 64)), iters=2, warmup=1)
    assert dt > 0
