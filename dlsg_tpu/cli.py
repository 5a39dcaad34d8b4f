"""Command-line entry points.

Replaces the reference's entry scripts with one CLI:

- `python -m dlsg_tpu.cli train`        <- train_debug.py (GAN / D-LSG training)
- `python -m dlsg_tpu.cli train-base`   <- train.py (CE baseline)
- `python -m dlsg_tpu.cli train-legacy` <- run.py (frames-only CapModel)
- `python -m dlsg_tpu.cli evaluate`     <- evaluate.py __main__ (standalone eval)
- `python -m dlsg_tpu.cli serve`        (no reference equivalent) caption the
  test set's feature clips with a trained checkpoint and print one JSON line
  per video ({"video_id", "caption"}) — inference as a product, no scoring.
  `--greedy` uses greedy decode; `--fast` enables the approximate-top-k beam
  (serve.Captioner's documented latency trade). `--bundle model.dlsg.npz`
  serves from a single-file bundle (no checkpoint dir / vocab pkl needed).
- `python -m dlsg_tpu.cli export`       (no reference equivalent) package a
  trained checkpoint (--metric / --torch_checkpoint) + vocab + config into
  one self-contained serving bundle: `export --metric best_CIDEr --out
  model.dlsg.npz` (see dlsg_tpu/bundle.py).

All reference flags (`utils/opt.py`) are accepted. No `torch.distributed.launch`
wrapper is needed: a single process drives all local TPU chips through the mesh;
multi-host runs use `jax.distributed.initialize` (env-driven) transparently.

`--synthetic` swaps in the hermetic synthetic dataset so the full system can be
exercised without the (unshipped) MSVD/MSR-VTT feature files.
"""

from __future__ import annotations

import argparse
import sys

import jax


def _build_datasets(
    cfg, synthetic: bool, synthetic_videos: int = 32, eval_only: bool = False
):
    """eval_only skips the caption training set and the reference file —
    `serve` needs only the eval features + vocab (no scoring)."""
    if synthetic:
        from dlsg_tpu.data.synthetic import SyntheticDataset, make_vocab

        vocab = make_vocab()
        train_ds = SyntheticDataset(cfg, vocab, num_videos=synthetic_videos)
        eval_ds = train_ds.eval_view()
        reference = train_ds.references
        return vocab, train_ds, eval_ds, reference

    from dlsg_tpu.data.datasets import CaptionDataset, EvalVideoDataset
    from dlsg_tpu.vocab import Vocabulary

    vocab = Vocabulary.load_reference_pkl(cfg.vocab_pkl_path)
    eval_ds = EvalVideoDataset(cfg)
    if eval_only:
        return vocab, None, eval_ds, None

    from dlsg_tpu.metrics.scorer import load_references_txt

    train_ds = CaptionDataset(cfg)
    reference = load_references_txt(cfg.test_reference_txt_path)
    return vocab, train_ds, eval_ds, reference


def _load_generator_params(cfg, vocab, extra_ns, mesh=None):
    """Init CapGnnModel params and overwrite from --torch_checkpoint /
    --metric (shared by `evaluate` and `serve`; cfg must be post-overrides)."""
    import numpy as np

    from dlsg_tpu import checkpoint as ckpt
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.utils.hostinit import init_on_host, place_replicated

    model = CapGnnModel(cfg, len(vocab))
    # batch-1 init (param shapes are batch-independent) — eager full-batch
    # on-device init costs ~400 s of RTTs on a relay-attached TPU
    frames = np.zeros((1, cfg.max_frames, cfg.feature_size), np.float32)
    regions = np.zeros((1, cfg.max_frames, cfg.num_obj, cfg.region_feature_size),
                       np.float32)
    caps = np.zeros((1, cfg.max_words), np.int32)
    if jax.process_count() > 1:
        # multi-host: keep eager (uncommitted) init — hostinit placement is
        # single-process only; batch-1 already cuts the RTT bytes
        import jax.numpy as jnp

        params = model.init(
            jax.random.PRNGKey(cfg.seed),
            jnp.asarray(frames), jnp.asarray(regions), jnp.asarray(caps),
        )["params"]
        host_inited = False
    else:
        params = init_on_host(
            model, jax.random.PRNGKey(cfg.seed), frames, regions, caps
        )["params"]
        host_inited = True
    if extra_ns.torch_checkpoint:
        from dlsg_tpu.convert import load_reference_checkpoint

        params = load_reference_checkpoint(extra_ns.torch_checkpoint, cfg)[
            "generator"
        ]["params"]
    elif extra_ns.metric:
        params = ckpt.restore_model(cfg.checkpoint_dir, extra_ns.metric, params)
    if host_inited:
        # the template (or converted/restored tree) may be CPU/host-committed:
        # stage it on the accelerator — replicated over the mesh when one is
        # live, so mesh-sharded eval/serve sees a consistent device set
        # (see the hostinit placement note)
        params = place_replicated(params, mesh)
    return model, params


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    command, rest = argv[0], argv[1:]

    # Restore the local CPU backend when the shell pins JAX_PLATFORMS to the
    # accelerator plugin (relay environments) — otherwise init_on_host's
    # ~400 s relay-RTT saving silently degrades to eager on-device init.
    # Must run before the first jax.devices() call below.
    from dlsg_tpu.utils.hostinit import ensure_local_cpu_backend

    ensure_local_cpu_backend()

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--synthetic", action="store_true")
    extra.add_argument("--synthetic_videos", type=int, default=32)
    extra.add_argument("--no_debug", action="store_true", help="enable model saving")
    extra.add_argument(
        "--resume_epoch", type=str, default=None,
        help="resume from a full checkpoint: an epoch number, or 'latest' to "
        "auto-pick the highest epoch_N in checkpoint_dir (fresh start if none)",
    )
    extra.add_argument(
        "--resume", dest="resume_epoch", action="store_const", const="latest",
        help="shorthand for --resume_epoch latest",
    )
    extra.add_argument("--metric", type=str, default=None, help="eval: best_METEOR|best_CIDEr ckpt")
    extra.add_argument(
        "--allow_random_params", action="store_true",
        help="evaluate without a checkpoint (scores a randomly initialized model)",
    )
    extra.add_argument(
        "--torch_checkpoint", type=str, default=None,
        help="evaluate a reference-trained torch .pt (run_gun.py:302-310 "
        "schema) via the convert.py transliterator",
    )
    extra.add_argument(
        "--distributed", action="store_true",
        help="multi-host: jax.distributed.initialize() from cluster env vars",
    )
    extra.add_argument(
        "--greedy", action="store_true", help="serve: greedy decode instead of beam"
    )
    extra.add_argument(
        "--output", "--out", type=str, default=None, metavar="PATH",
        help="serve: write the JSON lines to this file instead of stdout; "
        "export: the bundle path (default model.dlsg.npz). --out is an "
        "explicit alias (and keeps pre-export scripts that abbreviated "
        "--output as --out working)",
    )
    extra.add_argument(
        "--features", type=str, default=None,
        help="serve: caption an .npz of pre-extracted features (arrays "
        "'frames' [N,max_frames,feature_size] and 'regions' "
        "[N,max_frames,>=num_obj,region_feature_size]; optional 'video_ids') "
        "instead of the dataset's eval split",
    )
    extra.add_argument(
        "--fast", action="store_true",
        help="serve: approximate-top-k beam (Captioner fast profile, -8.5%% "
        "latency at 99.97%% token agreement)",
    )
    extra.add_argument(
        "--bundle", type=str, default=None, metavar="PATH",
        help="serve: load a single-file serving bundle (from `export`) "
        "instead of checkpoint dir + vocab pkl",
    )
    extra.add_argument(
        "--listen", type=str, default=None, metavar="HOST:PORT",
        help="serve: run a long-lived HTTP captioning service instead of a "
        "batch run (GET /healthz, POST /caption with an .npz or JSON body "
        "of frames/regions; see dlsg_tpu/server.py)",
    )
    extra.add_argument(
        "--meteor_paraphrase_file", type=str, default=None, metavar="PATH",
        help="score METEOR with an official paraphrase resource (meteor-1.5 "
        "paraphrase-en.gz / raw PPDB / 'p1 ||| p2' pairs) instead of the "
        "curated tables — closes the table-content delta to the jar when the "
        "real data is available (metrics/meteor.py::load_paraphrase_file)",
    )
    extra.add_argument(
        "--meteor_synonym_file", type=str, default=None, metavar="PATH",
        help="METEOR stage-2 synonyms from a WordNet-derived groups/pairs "
        "file (metrics/meteor.py::load_synonym_file)",
    )
    extra.add_argument(
        "--meteor_function_words_file", type=str, default=None, metavar="PATH",
        help="METEOR function-word list from a corpus-derived file "
        "(metrics/meteor.py::load_function_words_file)",
    )
    extra.add_argument(
        "--warmup", action="store_true",
        help="serve --listen: pre-compile every request bucket shape before "
        "accepting traffic (first TPU compile is tens of seconds per shape)",
    )
    extra_ns, cfg_argv = extra.parse_known_args(rest)
    # via env vars so every scoring site (standalone eval, in-training eval,
    # serve) picks these up at its first Meteor() construction
    import os

    for flag, var in (
        ("meteor_paraphrase_file", "DLSG_METEOR_PARAPHRASE_FILE"),
        ("meteor_synonym_file", "DLSG_METEOR_SYNONYM_FILE"),
        ("meteor_function_words_file", "DLSG_METEOR_FUNCTION_WORDS_FILE"),
    ):
        if getattr(extra_ns, flag):
            os.environ[var] = getattr(extra_ns, flag)
    if extra_ns.distributed:
        jax.distributed.initialize()

    from dlsg_tpu.config import parse_opt
    from dlsg_tpu.parallel.mesh import make_mesh

    cfg = parse_opt(cfg_argv)
    # mesh layout from config: data axis x model axis (tensor parallelism for
    # the vocab head, parallel/mesh.py TP_RULES). Defaults: all devices on
    # data, model axis 1 (pure DP — the reference's DDP-only layout).
    if len(jax.devices()) > 1 or cfg.mesh_model_axis > 1:
        mesh = make_mesh(n_data=cfg.mesh_data_axis, n_model=cfg.mesh_model_axis)
    else:
        mesh = None
    if command == "serve" and extra_ns.bundle:
        pass  # a bundle IS the trained model — no checkpoint guard needed
    elif command in ("evaluate", "serve", "export") and (
        not extra_ns.metric and not extra_ns.torch_checkpoint
        and not extra_ns.allow_random_params
    ):
        # fail BEFORE any vocab/dataset loading — the guard needs only flags
        print(
            f"{command}: no --metric given — this would run a RANDOMLY "
            "INITIALIZED model. Pass --metric best_CIDEr (or another saved "
            "checkpoint name), or --allow_random_params to force.",
            file=sys.stderr,
        )
        return 2

    if command == "serve" and extra_ns.bundle and not (
        extra_ns.features or extra_ns.listen
    ):
        print(
            "serve: --bundle requires --features or --listen (the bundle "
            "carries no dataset; give it clips or run it as a service)",
            file=sys.stderr,
        )
        return 2
    if command == "serve" and extra_ns.bundle:
        vocab = train_ds = eval_ds = reference = None  # all inside the bundle
    elif command in ("serve", "export") and (
        extra_ns.features or extra_ns.listen or command == "export"
    ):
        # captioning arbitrary pre-extracted features, serving over HTTP, or
        # packaging a bundle: no dataset files needed, only the vocab
        if extra_ns.synthetic:
            from dlsg_tpu.data.synthetic import make_vocab

            vocab = make_vocab()
        else:
            from dlsg_tpu.vocab import Vocabulary

            vocab = Vocabulary.load_reference_pkl(cfg.vocab_pkl_path)
        train_ds = eval_ds = reference = None
    else:
        vocab, train_ds, eval_ds, reference = _build_datasets(
            cfg, extra_ns.synthetic, extra_ns.synthetic_videos,
            eval_only=(command == "serve"),
        )
    # multi-host: each process loads a disjoint per-host data shard; the
    # jitted steps consume the globally-assembled batch (parallel/mesh.py
    # globalize_batch / data/prefetch.py). Single process: (1, 0) no-op.
    shards = dict(num_shards=jax.process_count(), shard_index=jax.process_index())

    if command == "train":
        from dlsg_tpu.train.trainer import RunGAN

        runner = RunGAN(
            cfg, vocab, train_ds, eval_ds, reference,
            mesh=mesh, is_debug=not extra_ns.no_debug, resume_epoch=extra_ns.resume_epoch,
        )
        runner.train(**shards)
        return 0

    if command in ("train-base", "train-legacy") and extra_ns.resume_epoch is not None:
        # only the GAN trainer writes/restores full training checkpoints
        # (reference parity: run_gun.py:302-310 — run_graph.py / run.py never
        # checkpoint); silently dropping the flag would fake a resume
        print(
            f"{command}: --resume/--resume_epoch is only supported by `train` "
            "(the baseline trainers keep no full training checkpoints, "
            "matching the reference)",
            file=sys.stderr,
        )
        return 2

    if command == "train-base":
        from dlsg_tpu.train.trainer import Run

        runner = Run(
            cfg, vocab, train_ds, eval_ds, reference,
            mesh=mesh, is_debug=not extra_ns.no_debug,
        )
        runner.train(**shards)
        return 0

    if command == "train-legacy":
        from dlsg_tpu.train.trainer import RunLegacy

        runner = RunLegacy(
            cfg, vocab, train_ds, eval_ds, reference,
            mesh=mesh, is_debug=not extra_ns.no_debug,
        )
        runner.train(**shards)
        return 0

    if command in ("evaluate", "export") or (
        command == "serve" and not extra_ns.bundle
    ):
        from dlsg_tpu.config import apply_dataset_overrides

        cfg = apply_dataset_overrides(cfg)
        model, params = _load_generator_params(cfg, vocab, extra_ns, mesh=mesh)

    if command == "export":
        from dlsg_tpu.bundle import save_bundle

        out = extra_ns.output or "model.dlsg.npz"
        save_bundle(out, cfg, vocab, params)
        import os

        print(
            f"export: wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB — "
            f"{len(vocab)}-word vocab, {cfg.dataset} config)",
            file=sys.stderr,
        )
        return 0

    if command == "serve":
        import json

        import numpy as np

        from dlsg_tpu.data.loader import eval_batches
        from dlsg_tpu.serve import Captioner, jsonable_id

        import contextlib
        import time

        if extra_ns.bundle:
            captioner = Captioner.from_bundle(
                extra_ns.bundle, fast=extra_ns.fast, mesh=mesh
            )
            cfg = captioner.cfg  # the bundle's resolved config drives serving
        else:
            captioner = Captioner.from_params(
                cfg, vocab, params, fast=extra_ns.fast, mesh=mesh
            )
        if extra_ns.listen:
            from dlsg_tpu.server import CaptionServer

            if extra_ns.warmup:
                t0 = time.perf_counter()
                n_shapes = captioner.warmup(greedy=extra_ns.greedy)
                print(
                    f"serve: warmed {n_shapes} bucket shapes in "
                    f"{time.perf_counter() - t0:.1f}s",
                    file=sys.stderr,
                )
            host, _, port = extra_ns.listen.rpartition(":")
            server = CaptionServer(captioner, host or "0.0.0.0", int(port))
            print(
                f"serve: listening on {server.server_address[0]}:"
                f"{server.server_address[1]} (POST /caption, GET /healthz)",
                file=sys.stderr,
            )
            try:
                server.serve_forever()
            except KeyboardInterrupt:
                pass
            finally:
                server.server_close()
            return 0

        n_done = 0
        t0 = time.perf_counter()
        with contextlib.ExitStack() as stack:
            out = sys.stdout
            if extra_ns.output:
                out = stack.enter_context(open(extra_ns.output, "w"))

            def emit(frames, regions, video_ids):
                nonlocal n_done
                vids = np.asarray(video_ids)
                if len(vids) != len(frames):
                    raise ValueError(
                        f"serve: {len(frames)} clips but {len(vids)} video_ids "
                        "— refusing to caption misaligned inputs"
                    )
                sentences = captioner.caption(frames, regions, greedy=extra_ns.greedy)
                for vid, sent in zip(vids, sentences):
                    out.write(json.dumps(
                        {"video_id": jsonable_id(vid), "caption": sent}
                    ) + "\n")
                out.flush()  # bound a mid-run crash's loss to one batch
                n_done += len(sentences)

            if extra_ns.features:
                data = np.load(extra_ns.features)
                frames, regions = data["frames"], data["regions"]
                vids = (
                    data["video_ids"] if "video_ids" in data
                    else np.arange(frames.shape[0])
                )
                emit(frames, regions, vids)
            else:
                for batch in eval_batches(
                    eval_ds, cfg.test_batch_size, pad_to_full=False, **shards
                ):
                    emit(batch["frames"], batch["regions"], batch["video_ids"])
        dt = time.perf_counter() - t0
        print(
            f"serve: {n_done} captions in {dt:.2f}s ({n_done / max(dt, 1e-9):.1f}/s, "
            "incl. compile)",
            file=sys.stderr,
        )
        return 0

    if command == "evaluate":
        from dlsg_tpu.data.loader import eval_batches
        from dlsg_tpu.evaluation.evaluate import evaluate, make_decode_fn

        if mesh is not None and jax.process_count() > 1:
            from dlsg_tpu.parallel.mesh import make_mesh as _mm

            eval_mesh = _mm(devices=jax.local_devices())
        else:
            eval_mesh = mesh
        decode_fn = make_decode_fn(model, cfg, mesh=eval_mesh)
        scores, result, _, t = evaluate(
            decode_fn,
            {"params": params},
            eval_batches(eval_ds, cfg.test_batch_size, **shards),
            vocab,
            reference,
            cross_host_gather=jax.process_count() > 1,
            stage_dtype=cfg.stage_dtype,
        )
        for k, v in scores.items():
            print(f"{k}: {100 * v:.6f}")
        print(f"inference time: {t:.3f}s")
        return 0

    print(f"unknown command: {command}\n{__doc__}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
