"""TPU smoke test — capability parity with `embeddings/smoke_test_gpu.py:15-194`
(5 checks: device available, framework import, model load, single embed,
batch embed w/ throughput), re-targeted at the TPU stack:

  1. device — a TPU/accelerator is visible to JAX
  2. xla — jit compile + execute a matmul on the MXU
  3. pallas — compile + execute a Pallas kernel via Mosaic
  4. encode_one — one text through the encoder stage
  5. encode_batch — batched encode with items/sec throughput
"""
from __future__ import annotations

import json
import time
from typing import Dict


def run_smoke() -> Dict:
    checks = {}
    ok = True

    import numpy as np

    # 1. device
    try:
        import jax

        devs = jax.devices()
        kind = str(devs[0].device_kind)
        checks["device"] = {"ok": True, "n_devices": len(devs), "kind": kind, "backend": jax.default_backend()}
    except Exception as e:  # noqa: BLE001
        checks["device"] = {"ok": False, "error": str(e)}
        return {"ok": False, "checks": checks}

    # 2. XLA matmul on the MXU
    try:
        import jax.numpy as jnp

        x = jnp.ones((1024, 1024), jnp.bfloat16)
        t0 = time.perf_counter()
        y = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.float32))(x)
        jax.block_until_ready(y)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            y = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.float32))(x)
        jax.block_until_ready(y)
        exec_s = (time.perf_counter() - t0) / 10
        tflops = 2 * 1024**3 / exec_s / 1e12
        checks["xla_matmul"] = {"ok": bool(np.isfinite(float(y[0, 0]))), "compile_s": round(compile_s, 2), "tflops": round(tflops, 2)}
    except Exception as e:  # noqa: BLE001
        checks["xla_matmul"] = {"ok": False, "error": str(e)[:200]}
        ok = False

    # 3. Pallas kernel through Mosaic
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0 + 1.0

        f = jax.jit(
            lambda x: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=jax.default_backend() == "cpu",
            )(x)
        )
        out = f(jnp.ones((256, 128), jnp.float32))
        checks["pallas"] = {"ok": bool(abs(float(out.sum()) - 256 * 128 * 3.0) < 1e-3)}
    except Exception as e:  # noqa: BLE001
        checks["pallas"] = {"ok": False, "error": str(e)[:200]}
        ok = False

    # 4+5. encoder single + batch throughput
    try:
        from plotpointe_tpu.models.encoders import hash_text_encoder

        enc = hash_text_encoder(dim=384)
        one = enc(["smoke test item"])
        checks["encode_one"] = {"ok": one.shape == (1, 384)}
        texts = [f"item number {i} with some description" for i in range(256)]
        t0 = time.perf_counter()
        batch = enc(texts)
        dt = time.perf_counter() - t0
        checks["encode_batch"] = {"ok": batch.shape == (256, 384), "items_per_sec": round(256 / dt, 1)}
    except Exception as e:  # noqa: BLE001
        checks["encode_batch"] = {"ok": False, "error": str(e)[:200]}
        ok = False

    ok = ok and all(c.get("ok") for c in checks.values())
    return {"ok": ok, "checks": checks}


def main(argv=None):
    report = run_smoke()
    print(json.dumps(report, indent=2))
    raise SystemExit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
