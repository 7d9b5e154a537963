"""Unified CLI — `python -m plotpointe_tpu.cli <command>`.

Replaces the reference's per-script argparse CLIs with one stable entrypoint
(pattern of `plotpointe/embeddings/cli.py:26-45`). Commands map to pipeline
stages: stage, validate, build-ui, build-knn, fuse, train, export, serve,
gate, bench-smoke.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _cmd_synth(args):
    from plotpointe_tpu.data.synthetic import synthetic_catalog, synthetic_interactions
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    store = ArtifactStore()
    df, (_, i_fac) = synthetic_interactions(
        args.users, args.items, args.interactions, seed=args.seed, return_factors=True,
        n_clusters=args.clusters, candidate_pool=args.candidate_pool,
        affinity_strength=args.affinity, cluster_pool_bias=args.cluster_pool_bias,
        user_cluster_sigma=args.user_cluster_sigma,
        item_cluster_sigma=args.item_cluster_sigma,
    )
    items = synthetic_catalog(df, n_extra_items=args.extra_items, seed=args.seed, item_factors=i_fac)
    store.save_parquet(df, f"{args.out}/interactions.parquet")
    store.save_parquet(items, f"{args.out}/items.parquet")
    print(json.dumps({"n_interactions": len(df), "n_items": len(items), "out": args.out}))


def _cmd_stage(args):
    from plotpointe_tpu.data.stage import stage

    uris, stats = stage(args.reviews, args.meta, args.out, max_records=args.max_records)
    print(json.dumps(stats, indent=2))


def _cmd_validate(args):
    from plotpointe_tpu.data.validate import validate
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    store = ArtifactStore()
    inter = store.load_parquet(f"{args.prefix}/interactions.parquet")
    items = store.load_parquet(f"{args.prefix}/items.parquet")
    rep = validate(inter, items)
    print(json.dumps(rep.to_dict(), indent=2))
    sys.exit(0 if rep.passed else 2)


def _cmd_build_ui(args):
    from plotpointe_tpu.graphs.ui_graph import build_ui_artifacts
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    store = ArtifactStore()
    inter = store.load_parquet(f"{args.staging_prefix}/interactions.parquet")
    uris, stats = build_ui_artifacts(inter, args.output_prefix, store=store)
    print(json.dumps(stats, indent=2))


def _cmd_build_knn(args):
    from plotpointe_tpu.graphs.knn import cosine_knn_graph
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    store = ArtifactStore()
    feats = store.load_npy(args.features)
    _, stats = cosine_knn_graph(
        np.asarray(feats),
        out_prefix=args.output_prefix,
        feature_name=args.feature_name,
        k=args.k,
        min_similarity=args.min_similarity,
        store=store,
    )
    print(json.dumps(stats, indent=2))


def _cmd_embed_text(args):
    from plotpointe_tpu.models.embed_stages import embed_text_stage
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    store = ArtifactStore()
    items = store.load_parquet(f"{args.staging_prefix}/items.parquet")
    _, meta = embed_text_stage(items, args.output_prefix, store=store, batch_size=args.batch_size,
                               weights=args.weights, vocab=args.vocab)
    print(json.dumps(meta, indent=2))


def _cmd_embed_image(args):
    from plotpointe_tpu.models.embed_stages import embed_image_stage
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    store = ArtifactStore()
    items = store.load_parquet(f"{args.staging_prefix}/items.parquet")
    _, meta = embed_image_stage(
        items,
        args.output_prefix,
        store=store,
        chunk_start=args.chunk_start,
        chunk_end=args.chunk_end,
        chunk_id=args.chunk_id,
        max_items=args.max_items,
        seed=args.seed,
        pixels=args.pixels or None,
        allow_remote=getattr(args, "allow_remote", False),
        weights=args.weights,
    )
    print(json.dumps(meta, indent=2))


def _cmd_convert_weights(args):
    from plotpointe_tpu.tools.convert_weights import convert

    cfg = convert(args.family, args.src, args.out, max_len=args.max_len)
    print(json.dumps({"out": args.out, **cfg}))


def _cmd_merge_images(args):
    from plotpointe_tpu.models.embed_stages import merge_image_chunks
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    emb, items = merge_image_chunks(args.output_prefix, args.n_chunks, store=ArtifactStore())
    print(json.dumps({"n_images": int(emb.shape[0]), "dims": int(emb.shape[1])}))


def _cmd_fuse(args):
    from plotpointe_tpu.config import FusionConfig
    from plotpointe_tpu.models.embed_stages import fuse_stage
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    store = ArtifactStore()
    items = store.load_parquet(f"{args.staging_prefix}/items.parquet")
    fused, cfg_out = fuse_stage(
        args.embeddings_prefix,
        out_prefix=args.output_prefix,
        cfg=FusionConfig.from_env(epochs=args.epochs, batch_size=args.batch_size),
        store=store,
        items=items,
    )
    print(json.dumps({"shape": list(fused.shape), "n_with_images": cfg_out["n_with_images"]}))


def _cmd_build_subset(args):
    from plotpointe_tpu.data.subset import build_interacted_subset
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    store = ArtifactStore()
    items = store.load_parquet(f"{args.staging_prefix}/items.parquet")
    interactions = store.load_parquet(f"{args.staging_prefix}/interactions.parquet")
    full = np.asarray(store.load_npy(args.features, mmap=True))
    subset, asins = build_interacted_subset(
        full, items, interactions, out_prefix=args.output_prefix, feature_name=args.feature_name, store=store
    )
    print(json.dumps({"shape": list(subset.shape), "n_interacted": len(asins)}))


def _cmd_train(args):
    from plotpointe_tpu.config import TrainConfig
    from plotpointe_tpu.pipeline import train_from_artifacts

    cfg = TrainConfig.from_env(
        model_family=args.model_family,
        hidden_dim=args.hidden_dim,
        layers=args.layers,
        heads=args.heads,
        epochs=args.epochs,
        samples_per_epoch=args.samples_per_epoch,
        steps_per_epoch=args.steps_per_epoch,
        seed=args.seed,
        eval_neg_k=args.eval_neg_k,
        item_features=args.item_features,
        loss=args.loss,
        structured_logs=args.structured_logs,
        attn_impl=args.attn_impl,
        spmm_impl=args.spmm_impl,
        optimizer=args.optimizer,
        warmup_steps=args.warmup_steps,
        mesh_shape=args.mesh,
    )
    results = train_from_artifacts(
        cfg,
        staging_prefix=args.staging_prefix,
        embeddings_prefix=args.embeddings_prefix,
        models_prefix=args.models_prefix,
        resume=args.resume,
    )
    print(json.dumps({"best_val_ndcg@20": results["best_val_ndcg@20"], "test": results["test"]}, indent=2))


def _cmd_gate(args):
    from plotpointe_tpu.tools.promotion_gate import main as gate_main

    gate_main(
        ["--current", args.current, "--baseline", args.baseline, "--split", args.split,
         "--metric", args.metric, "--mode", args.mode, "--tol", str(args.tol)]
    )


def _cmd_export(args):
    from plotpointe_tpu.tools.export import export_item_embeddings
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    store = ArtifactStore()
    interactions = store.load_parquet(f"{args.staging_prefix}/interactions.parquet")
    feats = np.asarray(store.load_npy(args.features)) if args.features else None
    emb = export_item_embeddings(
        store.fetch(args.checkpoint), interactions, feats, args.out, store=store
    )
    print(json.dumps({"shape": list(emb.shape), "out": args.out}))


def _cmd_serve(args):
    import os

    if args.stdlib or os.environ.get("PLOTPOINTE_STDLIB_HTTP"):
        from plotpointe_tpu.serving.httpd import serve as stdlib_serve
        from plotpointe_tpu.serving.runtime import RecommenderRuntime, ServingConfig

        rt = None
        uri = args.item_embeddings or os.environ.get("ITEM_EMBEDDINGS_URI")
        if uri:
            rt = RecommenderRuntime(ServingConfig(item_embeddings_uri=uri, topk=args.topk))
            rt.startup()
        telemetry = None
        if args.telemetry_dir:
            from plotpointe_tpu.serving.telemetry import ServingTelemetry

            telemetry = ServingTelemetry(root=args.telemetry_dir,
                                         durable=True if args.telemetry_durable else None)
        print(json.dumps({"serving": f"http://{args.host}:{args.port}", "loaded": rt is not None,
                          "telemetry": bool(telemetry), "micro_batch": args.micro_batch}))
        stdlib_serve(args.host, args.port, runtime=rt, telemetry=telemetry, block=True,
                     micro_batch=args.micro_batch, micro_batch_max=args.micro_batch_max,
                     micro_batch_wait_ms=args.micro_batch_wait_ms)
        return

    from plotpointe_tpu.serving.app import create_app
    import uvicorn

    app = create_app()
    uvicorn.run(app, host=args.host, port=args.port)


def _cmd_smoke(args):
    from plotpointe_tpu.tools.smoke_tpu import main as smoke_main

    smoke_main([])


def _cmd_validate_manifests(args):
    from plotpointe_tpu.tools.manifest_validate import main as mv_main

    mv_main(["--registry", args.registry] + (["--manifest-id", args.manifest_id] if args.manifest_id else []))


def _pipeline_steps(args):
    """The stage list shared by the serial and parallel drivers."""
    d = args.workdir
    embed_image = [
        ["embed-image", "--staging-prefix", f"{d}/staging", "--output-prefix", f"{d}/embeddings"]
    ]
    merge = []
    if getattr(args, "parallel", False) and args.image_chunks > 1:
        # ceil-split over the item table; embed-image clamps chunk_end itself
        per = (args.items + args.extra_items + args.image_chunks - 1) // args.image_chunks
        embed_image = [
            ["embed-image", "--staging-prefix", f"{d}/staging", "--output-prefix", f"{d}/embeddings",
             "--chunk-start", str(c * per), "--chunk-end", str((c + 1) * per), "--chunk-id", str(c)]
            for c in range(args.image_chunks)
        ]
        merge = [["merge-images", "--output-prefix", f"{d}/embeddings",
                  "--n-chunks", str(args.image_chunks)]]
    return {
        "synth": ["synth", "--out", f"{d}/staging", "--users", str(args.users), "--items", str(args.items),
                  "--interactions", str(args.interactions), "--extra-items", str(args.extra_items)],
        "validate": ["validate", "--prefix", f"{d}/staging"],
        "embed_text": ["embed-text", "--staging-prefix", f"{d}/staging", "--output-prefix", f"{d}/embeddings"],
        "embed_image": embed_image,
        "merge_images": merge,
        "fuse": ["fuse", "--staging-prefix", f"{d}/staging", "--embeddings-prefix", f"{d}/embeddings",
                 "--epochs", "2", "--batch-size", "256"],
        "build_ui": ["build-ui", "--staging-prefix", f"{d}/staging", "--output-prefix", f"{d}/graphs"],
        "subset_fused": ["build-subset", "--staging-prefix", f"{d}/staging", "--features", f"{d}/embeddings/fused.npy",
                         "--output-prefix", f"{d}/embeddings", "--feature-name", "fused"],
        "subset_txt": ["build-subset", "--staging-prefix", f"{d}/staging", "--features", f"{d}/embeddings/txt.npy",
                       "--output-prefix", f"{d}/embeddings", "--feature-name", "txt"],
        "build_knn": ["build-knn", "--features", f"{d}/embeddings/fused_interacted.npy", "--output-prefix", f"{d}/graphs"],
        "train": ["train", "--staging-prefix", f"{d}/staging", "--embeddings-prefix", f"{d}/embeddings",
                  "--models-prefix", f"{d}/models", "--item-features", "fused",
                  "--epochs", str(args.epochs), "--samples-per-epoch", str(args.samples_per_epoch),
                  "--eval-neg-k", str(args.eval_neg_k), "--hidden-dim", str(args.hidden_dim),
                  "--attn-impl", args.attn_impl],
    }


def _cmd_anchor(args):
    from plotpointe_tpu.tools.anchor import main as anchor_main

    argv = ["--scale", args.scale, "--affinity", str(args.affinity),
            "--epochs", str(args.epochs), "--steps-per-epoch", str(args.steps_per_epoch),
            "--beyond-steps", str(args.beyond_steps), "--seed", str(args.seed), "--out", args.out]
    if args.skip_beyond:
        argv.append("--skip-beyond")
    if args.skip_baselines:
        argv.append("--skip-baselines")
    if args.skip_reference:
        argv.append("--skip-reference")
    argv += ["--optimizer", args.optimizer, "--warmup-steps", str(args.warmup_steps),
             "--clusters", str(args.clusters), "--candidate-pool", str(args.candidate_pool),
             "--feature-noise", str(args.feature_noise),
             "--cluster-pool-bias", str(args.cluster_pool_bias),
             "--user-cluster-sigma", str(args.user_cluster_sigma),
             "--item-cluster-sigma", str(args.item_cluster_sigma)]
    if args.gate_baseline:
        argv += ["--gate-baseline", args.gate_baseline]
    anchor_main(argv)


_STAGE_SENTINELS = {
    # stage name -> output artifact proving completion (relative to workdir)
    "synth": "staging/interactions.parquet",
    "embed_text": "embeddings/txt.npy",
    "merge_images": "embeddings/img.npy",
    "fuse": "embeddings/fused.npy",
    "build_ui": "graphs/ui_edges.npz",
    "subset_fused": "embeddings/fused_interacted.npy",
    "subset_txt": "embeddings/txt_interacted.npy",
    "build_knn": "graphs/ii_edges_fused.npz",
}


def _stage_done(args, name: str, step=None) -> bool:
    """--continue support (the reference's auto_continue_pipeline.sh state
    polling, as artifact-presence checks): a stage is skippable when its
    output artifact already exists. validate/train always rerun (cheap /
    resume-aware respectively)."""
    import os

    if not getattr(args, "cont", False):
        return False
    if name == "embed_image" and step is not None:
        # chunked: sentinel is the chunk file (or img.npy for the unchunked run)
        sfx = ""
        if "--chunk-id" in step:
            sfx = f"_chunk{step[step.index('--chunk-id') + 1]}"
        return os.path.exists(f"{args.workdir}/embeddings/img{sfx}.npy")
    rel = _STAGE_SENTINELS.get(name)
    return rel is not None and os.path.exists(f"{args.workdir}/{rel}")


def _cmd_pipeline(args):
    """Run the full pipeline: the reference's run_pipeline_v2.sh as one
    orchestrated command. --in-process runs stages as function calls in this
    interpreter (one TPU attach, one jax runtime) instead of subprocesses.
    --parallel overlaps the independent stages as concurrent subprocesses —
    the in-process equivalent of scripts/parallel_pipeline.sh:44-80 +
    parallel_image_embeddings.sh:33-76 (text || 4-way-chunked image
    embeddings, then graph builds overlapped). Concurrent stages are forced
    onto CPU (the TPU admits one process at a time; the reference's analog
    is its CPU/GPU stage overlap). --continue skips stages whose output
    artifacts already exist (auto_continue_pipeline.sh semantics)."""
    import subprocess
    import time as _time

    base = [sys.executable, "-m", "plotpointe_tpu.cli"]
    S = _pipeline_steps(args)
    t_start = _time.time()
    skipped = []

    if args.parallel:
        if args.in_process:
            raise SystemExit("--parallel requires subprocess mode (drop --in-process)")
        import os
        import threading

        cpu_env = {**os.environ, "PLOTPOINTE_PLATFORM": "cpu"}

        def run(step, env=None, name=None):
            if name and _stage_done(args, name, step):
                skipped.append(name)
                print(f"[pipeline] skip (artifact exists): {name}", flush=True)
                return
            t0 = _time.time()
            print(f"[pipeline] {' '.join(step)}", flush=True)
            subprocess.run(base + step, check=True, env=env)
            print(f"[pipeline] done in {_time.time() - t0:.1f}s: {step[0]}", flush=True)

        def lane(steps, env=None):
            for name, s in steps:
                run(s, env=env, name=name)

        def concurrent(lanes, env=None):
            errs = []

            def guard(fn, *a):
                try:
                    fn(*a)
                except BaseException as e:  # noqa: BLE001 — surfaced below
                    errs.append(e)

            ts = [threading.Thread(target=guard, args=(lane, ln, env)) for ln in lanes]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            if errs:
                raise errs[0]

        run(S["synth"], name="synth")
        run(S["validate"])
        # text || image chunks (CPU encoders, reference: parallel_image_embeddings.sh)
        concurrent([[("embed_text", S["embed_text"])]]
                   + [[("embed_image", c)] for c in S["embed_image"]], env=cpu_env)
        for m in S["merge_images"]:
            run(m, name="merge_images")
        run(S["fuse"], name="fuse")
        # graph builds overlap: U-I || (subset fused -> kNN) || subset txt
        concurrent([
            [("build_ui", S["build_ui"])],
            [("subset_fused", S["subset_fused"]), ("build_knn", S["build_knn"])],
            [("subset_txt", S["subset_txt"])],
        ], env=cpu_env)
        run(S["train"])
        print(json.dumps({"pipeline": "complete", "workdir": args.workdir,
                          "parallel": True, "skipped": skipped,
                          "wall_s": round(_time.time() - t_start, 2)}))
        return

    steps = [("synth", S["synth"]), ("validate", S["validate"]), ("embed_text", S["embed_text"])]
    steps += [("embed_image", c) for c in S["embed_image"]]
    steps += [("merge_images", m) for m in S["merge_images"]]
    steps += [("fuse", S["fuse"]), ("build_ui", S["build_ui"]), ("subset_fused", S["subset_fused"]),
              ("subset_txt", S["subset_txt"]), ("build_knn", S["build_knn"]), ("train", S["train"])]
    for name, step in steps:
        if _stage_done(args, name, step):
            skipped.append(name)
            print(f"[pipeline] skip (artifact exists): {name}", flush=True)
            continue
        print(f"[pipeline] {' '.join(step)}", flush=True)
        if args.in_process:
            try:
                main(step)
            except SystemExit as e:  # validate et al. exit by design
                if e.code not in (0, None):
                    raise
        else:
            subprocess.run(base + step, check=True)
    print(json.dumps({"pipeline": "complete", "workdir": args.workdir, "parallel": False,
                      "skipped": skipped, "wall_s": round(_time.time() - t_start, 2)}))


def _cmd_ablate(args):
    """Single-variable ablation sweep (reference: scripts/launch_gat_ablations.sh
    submits 7 concurrent Vertex jobs; here they run sequentially in-process and
    produce one consolidated report)."""
    from plotpointe_tpu.config import TrainConfig
    from plotpointe_tpu.pipeline import train_from_artifacts

    base = dict(
        model_family="gat", hidden_dim=args.hidden_dim, layers=2, heads=1,
        epochs=args.epochs, samples_per_epoch=args.samples_per_epoch,
        steps_per_epoch=args.steps_per_epoch,
        eval_neg_k=args.eval_neg_k, item_features=args.item_features,
        loss="bpr", attn_impl=args.attn_impl,
        optimizer=args.optimizer, warmup_steps=args.warmup_steps,
    )
    variants = {
        "fused_bpr_l2_h1": {},
        "bce": {"loss": "bce"},
        "txt": {"item_features": "txt"},
        "heads2": {"heads": 2},
        "layers1": {"layers": 1},
        "layers3": {"layers": 3},
        "lightgcn": {"model_family": "lightgcn"},
    }
    report = {}
    for name, delta in variants.items():
        if args.only and name not in args.only.split(","):
            continue
        cfg = TrainConfig(**{**base, **delta}, run_id=f"ablate_{name}")
        try:
            r = train_from_artifacts(
                cfg,
                staging_prefix=args.staging_prefix,
                embeddings_prefix=args.embeddings_prefix,
                models_prefix=f"{args.models_prefix}/{name}",
            )
            report[name] = {"test": r["test"], "best_val_ndcg@20": r["best_val_ndcg@20"]}
        except Exception as e:  # noqa: BLE001 - one failed variant must not kill the sweep
            report[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps({name: report[name]}), flush=True)
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    ArtifactStore().save_json(report, f"{args.models_prefix}/ablations_report.json")
    print(json.dumps(report, indent=2))


def _cmd_drift(args):
    from plotpointe_tpu.serving.telemetry import ServingTelemetry

    tel = ServingTelemetry(root=args.telemetry_dir)
    print(json.dumps(tel.aggregate_drift(), indent=2))


def main(argv=None):
    # NOTE: do NOT enable JAX_COMPILATION_CACHE_DIR here — the experimental
    # remote-compile TPU backend hangs when the persistent cache is active
    # (observed: train step never finished compiling with the cache enabled).
    #
    # PLOTPOINTE_PLATFORM=cpu forces the CPU backend. Plain JAX_PLATFORMS is
    # NOT enough on hosts whose sitecustomize programmatically selects the
    # TPU plugin after registration.
    import os

    platform = os.environ.get("PLOTPOINTE_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    ap = argparse.ArgumentParser(prog="plotpointe_tpu", description="TPU-native graph recommender pipeline")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("synth", help="generate a synthetic staged dataset")
    p.add_argument("--out", required=True)
    p.add_argument("--users", type=int, default=2000)
    p.add_argument("--items", type=int, default=1200)
    p.add_argument("--interactions", type=int, default=50_000)
    p.add_argument("--extra-items", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    # category-structured latents (the learnable-signal regime, tools/anchor.py)
    p.add_argument("--clusters", type=int, default=0)
    p.add_argument("--candidate-pool", type=int, default=16)
    p.add_argument("--affinity", type=float, default=3.0)
    p.add_argument("--cluster-pool-bias", type=float, default=0.0)
    p.add_argument("--user-cluster-sigma", type=float, default=0.6)
    p.add_argument("--item-cluster-sigma", type=float, default=0.35)
    p.set_defaults(fn=_cmd_synth)

    p = sub.add_parser("stage", help="stage SNAP loose-JSON dumps into parquet")
    p.add_argument("--reviews", required=True, help="reviews .json(.gz) path")
    p.add_argument("--meta", required=True, help="item metadata .json(.gz) path")
    p.add_argument("--out", required=True)
    p.add_argument("--max-records", type=int, default=None)
    p.set_defaults(fn=_cmd_stage)

    p = sub.add_parser("validate", help="contract-validate staged data")
    p.add_argument("--prefix", required=True)
    p.set_defaults(fn=_cmd_validate)

    p = sub.add_parser("build-ui", help="build U-I graph artifacts")
    p.add_argument("--staging-prefix", required=True)
    p.add_argument("--output-prefix", required=True)
    p.set_defaults(fn=_cmd_build_ui)

    p = sub.add_parser("build-knn", help="build item-item cosine kNN graph")
    p.add_argument("--features", required=True)
    p.add_argument("--output-prefix", required=True)
    p.add_argument("--feature-name", default="fused")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--min-similarity", type=float, default=0.3)
    p.set_defaults(fn=_cmd_build_knn)

    p = sub.add_parser("embed-text", help="text embeddings (txt.npy)")
    p.add_argument("--staging-prefix", required=True)
    p.add_argument("--output-prefix", required=True)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--weights", default=None, help="converted MiniLM npz (tools/convert_weights.py)")
    p.add_argument("--vocab", default=None, help="WordPiece vocab.txt for the real-weight path")
    p.set_defaults(fn=_cmd_embed_text)

    p = sub.add_parser("embed-image", help="image embeddings (img.npy), chunk-shardable")
    p.add_argument("--staging-prefix", required=True)
    p.add_argument("--output-prefix", required=True)
    p.add_argument("--chunk-start", type=int, default=None)
    p.add_argument("--chunk-end", type=int, default=None)
    p.add_argument("--chunk-id", type=int, default=None)
    p.add_argument("--max-items", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--allow-remote", action="store_true",
                   help="download http(s) image_urls (timeout+retry), like the "
                        "reference's per-item fetch loop; off by default "
                        "(zero-egress)")
    p.add_argument("--pixels", action="store_true",
                   help="decode local image files (CLIP preprocessing + ViT encode)")
    p.add_argument("--weights", default=None, help="converted CLIP-vision npz")
    p.set_defaults(fn=_cmd_embed_image)

    p = sub.add_parser("convert-weights", help="HF checkpoint dir -> encoder npz (offline)")
    p.add_argument("--family", choices=["minilm", "clip-vision"], required=True)
    p.add_argument("--src", required=True, help="local HF model directory")
    p.add_argument("--out", required=True)
    p.add_argument("--max-len", type=int, default=256)
    p.set_defaults(fn=_cmd_convert_weights)

    p = sub.add_parser("merge-images", help="merge image embedding chunks")
    p.add_argument("--output-prefix", required=True)
    p.add_argument("--n-chunks", type=int, required=True)
    p.set_defaults(fn=_cmd_merge_images)

    p = sub.add_parser("fuse", help="train fusion MLP, emit fused.npy")
    p.add_argument("--staging-prefix", required=True)
    p.add_argument("--embeddings-prefix", required=True)
    p.add_argument("--output-prefix", default=None)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1024)
    p.set_defaults(fn=_cmd_fuse)

    p = sub.add_parser("build-subset", help="slice full-catalog features to interacted items")
    p.add_argument("--staging-prefix", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--output-prefix", required=True)
    p.add_argument("--feature-name", default="txt")
    p.set_defaults(fn=_cmd_build_subset)

    p = sub.add_parser("train", help="train GAT or LightGCN")
    p.add_argument("--model-family", choices=["gat", "lightgcn"], default="gat")
    p.add_argument("--staging-prefix", required=True)
    p.add_argument("--embeddings-prefix", required=True)
    p.add_argument("--models-prefix", required=True)
    p.add_argument("--hidden-dim", type=int, default=128)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--heads", type=int, default=1)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--samples-per-epoch", type=int, default=200_000)
    p.add_argument("--steps-per-epoch", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--eval-neg-k", type=int, default=1000)
    p.add_argument("--item-features", choices=["fused", "txt"], default="fused")
    p.add_argument("--loss", choices=["bpr", "bce"], default="bpr")
    p.add_argument("--attn-impl", choices=["auto", "xla", "pallas"], default="auto",
                   help="auto = fused Pallas kernels on TPU, XLA golden path elsewhere")
    p.add_argument("--spmm-impl", choices=["auto", "xla", "pallas"], default="auto",
                   help="LightGCN propagation: auto = static Pallas SpMM on TPU")
    p.add_argument("--optimizer", choices=["adam", "adamw"], default="adam",
                   help="adam = reference parity (coupled L2); adamw decouples decay for long schedules")
    p.add_argument("--warmup-steps", type=int, default=0, help="linear lr warmup (beyond-parity)")
    p.add_argument("--structured-logs", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="save resume state each epoch and continue from it if present (preemption-safe)")
    p.add_argument("--mesh", default=None, metavar="SPEC",
                   help='train over a device mesh, e.g. "data:8" (ShardedTrainer: '
                        "row-sharded tables + edge-sharded message passing)")
    p.set_defaults(fn=_cmd_train)

    p = sub.add_parser("gate", help="promotion gate")
    p.add_argument("--current", required=True)
    p.add_argument("--baseline", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--metric", default="ndcg@20")
    p.add_argument("--mode", default="improve_or_equal")
    p.add_argument("--tol", type=float, default=0.0)
    p.set_defaults(fn=_cmd_gate)

    p = sub.add_parser("export", help="export item embeddings from a checkpoint")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--staging-prefix", required=True)
    p.add_argument("--features", default=None)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=_cmd_export)

    p = sub.add_parser("serve", help="run the recommender HTTP API")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--stdlib", action="store_true", help="use the stdlib HTTP server (no fastapi)")
    p.add_argument("--item-embeddings", default=None)
    p.add_argument("--topk", type=int, default=20)
    p.add_argument("--telemetry-dir", default=None, help="enable request/feedback JSONL telemetry")
    p.add_argument("--telemetry-durable", action="store_true",
                   help="route telemetry through the at-least-once durable queue (Pub/Sub+DLQ analog)")
    p.add_argument("--micro-batch", action="store_true",
                   help="coalesce concurrent /recommend calls into batched device scoring")
    p.add_argument("--micro-batch-max", type=int, default=64)
    p.add_argument("--micro-batch-wait-ms", type=float, default=3.0)
    p.set_defaults(fn=_cmd_serve)

    p = sub.add_parser("smoke-tpu", help="TPU capability smoke test (5 checks)")
    p.set_defaults(fn=_cmd_smoke)

    p = sub.add_parser("validate-manifests", help="check manifest artifact prefixes exist")
    p.add_argument("--registry", default="manifests/registry.json")
    p.add_argument("--manifest-id", default=None)
    p.set_defaults(fn=_cmd_validate_manifests)

    p = sub.add_parser("ablate", help="single-variable ablation sweep + report")
    p.add_argument("--staging-prefix", required=True)
    p.add_argument("--embeddings-prefix", required=True)
    p.add_argument("--models-prefix", required=True)
    p.add_argument("--hidden-dim", type=int, default=128)
    p.add_argument("--steps-per-epoch", type=int, default=1)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--samples-per-epoch", type=int, default=100_000)
    p.add_argument("--eval-neg-k", type=int, default=500)
    p.add_argument("--item-features", default="fused")
    p.add_argument("--attn-impl", choices=["auto", "xla", "pallas"], default="auto",
                   help="auto = fused Pallas kernels on TPU, XLA golden path elsewhere")
    p.add_argument("--optimizer", choices=["adam", "adamw"], default="adam")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--only", default=None, help="comma-separated variant names")
    p.set_defaults(fn=_cmd_ablate)

    p = sub.add_parser("drift", help="aggregate serving telemetry into drift stats")
    p.add_argument("--telemetry-dir", required=True)
    p.set_defaults(fn=_cmd_drift)

    p = sub.add_parser("anchor", help="quality-anchor run: reference GAT protocol on "
                                      "full-shape Amazon-calibrated synthetic data + controlled baselines")
    # defaults mirror tools/anchor.py: the round-4 calibrated learnable regime
    p.add_argument("--scale", choices=["full", "mini", "micro"], default="full")
    p.add_argument("--affinity", type=float, default=14.0)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--steps-per-epoch", type=int, default=1)
    p.add_argument("--beyond-steps", type=int, default=32)
    p.add_argument("--skip-beyond", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="tmp/anchor")
    p.add_argument("--gate-baseline", default=None)
    p.add_argument("--skip-baselines", action="store_true")
    p.add_argument("--skip-reference", action="store_true")
    p.add_argument("--optimizer", choices=["adam", "adamw"], default="adam")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--clusters", type=int, default=64)
    p.add_argument("--candidate-pool", type=int, default=64)
    p.add_argument("--feature-noise", type=float, default=0.02)
    p.add_argument("--cluster-pool-bias", type=float, default=0.6)
    p.add_argument("--user-cluster-sigma", type=float, default=0.35)
    p.add_argument("--item-cluster-sigma", type=float, default=0.35)
    p.set_defaults(fn=_cmd_anchor)

    p = sub.add_parser("pipeline", help="run the full synth->train pipeline in one command")
    p.add_argument("--workdir", required=True)
    p.add_argument("--users", type=int, default=2000)
    p.add_argument("--items", type=int, default=1200)
    p.add_argument("--interactions", type=int, default=50_000)
    p.add_argument("--extra-items", type=int, default=300)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--samples-per-epoch", type=int, default=50_000)
    p.add_argument("--eval-neg-k", type=int, default=500)
    p.add_argument("--hidden-dim", type=int, default=64)
    p.add_argument("--attn-impl", choices=["auto", "xla", "pallas"], default="auto",
                   help="auto = fused Pallas kernels on TPU, XLA golden path elsewhere")
    p.add_argument("--in-process", action="store_true",
                   help="run stages as function calls (one TPU attach) instead of subprocesses")
    p.add_argument("--parallel", action="store_true",
                   help="overlap independent stages (text || chunked image embeddings, "
                        "graph builds) as concurrent CPU subprocesses")
    p.add_argument("--image-chunks", type=int, default=4,
                   help="image-embedding shards under --parallel (reference: 4-way)")
    p.add_argument("--continue", dest="cont", action="store_true",
                   help="skip stages whose output artifacts already exist "
                        "(auto_continue_pipeline.sh semantics)")
    p.set_defaults(fn=_cmd_pipeline)

    p = sub.add_parser("provision", add_help=False,
                       help="declarative infra plan/apply/destroy (deploy/infra.yaml)")
    p.add_argument("rest", nargs=argparse.REMAINDER)
    p.set_defaults(fn=lambda a: __import__(
        "plotpointe_tpu.tools.provision", fromlist=["main"]).main(a.rest))

    p = sub.add_parser("jobs", add_help=False,
                       help="per-stage job specs: list/run (deploy/jobs/*.yaml)")
    p.add_argument("rest", nargs=argparse.REMAINDER)
    p.set_defaults(fn=lambda a: __import__(
        "plotpointe_tpu.tools.jobs", fromlist=["main"]).main(a.rest))

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
