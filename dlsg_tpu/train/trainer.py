"""Trainers.

- `RunGAN` — the full D-LSG adversarial trainer (reference `run_gun.py:RunGAN`):
  dataset hparam overrides, Adam + MultiStepLR for G and D, adaptive GAN lambda,
  scheduled sampling, mid-epoch eval on a saving schedule, best-metric model
  saving, full-epoch checkpoints, scalar logging.
- `Run` — CE-only baseline trainer over CapBaseline1 (reference
  `run_graph.py:Run`).

Layout differences from the reference (deliberate): the per-batch work is ONE
jitted device step (train/steps.py); everything in this file is host-side
orchestration — python loops over epochs/batches, schedule math, logging, and
checkpoint IO.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dlsg_tpu import checkpoint as ckpt
from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
from dlsg_tpu.data.loader import eval_batches, train_batches
from dlsg_tpu.evaluation.evaluate import evaluate, make_decode_fn
from dlsg_tpu.evaluation.results import ResultHandler
from dlsg_tpu.models.discriminator import DiscV2
from dlsg_tpu.models.generator import CapBaseline1, CapGnnModel
from dlsg_tpu.train.gan_lambda import init_lambda_state
from dlsg_tpu.train.optim import TrainState, make_optimizer, multistep_lr
from dlsg_tpu.train.schedule import saving_schedule, scheduled_sampling_epsilon
from dlsg_tpu.train.steps import make_ce_train_step, make_gan_train_step
from dlsg_tpu.utils.logging import MetricsWriter
from dlsg_tpu.utils.profiler import Stopwatch
from dlsg_tpu.vocab import Vocabulary

G_LR_MILESTONES = (4, 7)  # run_gun.py:94
D_LR_MILESTONES = (1, 4)  # run_gun.py:99
LR_GAMMA = 0.5


class _TrainerBase:
    def __init__(
        self,
        cfg: DLSGConfig,
        vocab: Vocabulary,
        train_dataset,
        eval_dataset,
        test_reference: Dict,
        mesh=None,
        is_debug: bool = True,
        resume_epoch: "Optional[int | str]" = None,
    ):
        cfg = apply_dataset_overrides(cfg)
        self.cfg = cfg
        self.vocab = vocab
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.test_reference = test_reference
        self.mesh = mesh
        self.is_leader = jax.process_index() == 0
        self.num_hosts = jax.process_count()
        if mesh is not None:
            from dlsg_tpu.parallel.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            for name, b in (
                ("train_batch_size", cfg.train_batch_size),
                ("test_batch_size", cfg.test_batch_size),
            ):
                if (b * self.num_hosts) % n_data:
                    raise ValueError(
                        f"{name}={b} x {self.num_hosts} host(s) must be divisible "
                        f"by the mesh data axis ({n_data} devices) — pick a "
                        f"divisible batch or a smaller mesh (make_mesh(n_data=...))"
                    )
        # eval decode is embarrassingly batch-parallel: in a multi-host run
        # each process decodes its OWN disjoint shard on its LOCAL devices
        # (no cross-host collectives), then results fan in via
        # evaluate(cross_host_gather=True) — replacing the reference's
        # all_gather_object with hard-coded world size 4 (run_gun.py:270-276)
        if mesh is not None and self.num_hosts > 1:
            from dlsg_tpu.parallel.mesh import make_mesh

            self.eval_mesh = make_mesh(devices=jax.local_devices())
        else:
            self.eval_mesh = mesh
        self.base_name = cfg.base_name()
        # per-epoch rng streams: each epoch folds its index into the base key
        # (`_epoch_rng`), so a run resumed from an epoch_N checkpoint draws
        # exactly the streams the uninterrupted run would have — resume is
        # bit-reproducible without checkpointing rng state
        self._base_rng = jax.random.key(cfg.seed, impl=cfg.rng_impl)
        self.rng = self._base_rng
        self.stopwatch = Stopwatch()
        self._trace_active = False
        self.last_epoch = -1
        # auto-resume: "latest" resolves to the highest epoch_N checkpoint on
        # disk, or a fresh start when there is none (the reference requires a
        # hand-passed epoch, run_gun.py:53-61 — a crash there silently
        # restarts from scratch; deliberately not copied)
        if resume_epoch == "latest":
            resume_epoch = ckpt.latest_epoch(cfg.checkpoint_dir)
            self._print(
                f"auto-resume: latest checkpoint epoch = {resume_epoch}"
                if resume_epoch is not None
                else "auto-resume: no checkpoint found, starting fresh"
            )
        elif isinstance(resume_epoch, str):
            resume_epoch = int(resume_epoch)
        self.resume_epoch = resume_epoch

        self.result_handler = ResultHandler(
            self.base_name,
            results_root=cfg.result_dir,
            beam_list=[cfg.beam_size],
            is_leader=self.is_leader,
            is_debug=is_debug,
        )
        self.writer = MetricsWriter(
            log_dir=f"{cfg.result_dir}/{self.base_name}/logs", enabled=self.is_leader
        )

    # ---- shared helpers ----
    def _maybe_graft_glove(self, params):
        """Replace the decoder word embedding with GloVe vectors when
        cfg.use_glove (layer.py:307-309,352-386)."""
        cfg = self.cfg
        if not cfg.use_glove:
            return params
        from dlsg_tpu.models.glove import graft_word_embedding, load_glove_matrix

        matrix = load_glove_matrix(
            self.vocab, cfg.word_size, cfg.glove_path, cfg.glove_cache_npy_path
        )
        self._print(f"GloVe embedding grafted from {cfg.glove_path}")
        return graft_word_embedding(params, matrix)

    def _apply_tp_layout(self, state):
        """Lay the generator's TrainState out with the tensor-parallel rules
        when the mesh has a model axis (cfg.mesh_model_axis > 1): the vocab
        head (word_restore) is column-sharded over `model`, its Adam moments
        with it, and the jitted steps then keep that layout step over step
        (parallel/mesh.py shard_train_state)."""
        from dlsg_tpu.parallel.mesh import MODEL_AXIS, shard_train_state

        if self.mesh is None or self.mesh.shape[MODEL_AXIS] <= 1:
            return state
        return shard_train_state(state, self.mesh)

    def _gen_optimizer(self):
        """Generator optimizer; freezes the word embedding when configured
        (the optax mask equivalent of requires_grad=False, model.py:52-53)."""
        frozen = ("word_embed",) if self.cfg.freeze_word_embed else ()
        return make_optimizer(self.cfg.learning_rate, frozen_paths=frozen)

    def _sample_batch(self):
        # HOST arrays: these exist only to drive model.init (which runs on the
        # local CPU backend, utils/hostinit.py) — device buffers would be waste
        cfg = self.cfg
        B = cfg.train_batch_size
        return {
            "frames": np.zeros((B, cfg.max_frames, cfg.feature_size), np.float32),
            "regions": np.zeros(
                (B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size), np.float32
            ),
            "captions": np.zeros((B, cfg.max_words), np.int32),
            "lengths": np.ones((B,), np.int32),
        }

    def _init_params(self, model, rng_seed: int, *args):
        """Parameter init: host-side CPU at batch 1 for single-process runs
        (a relay-attached device pays ~400 s of RTTs for eager init —
        utils/hostinit.py), eager on-device for multi-host runs (placement
        semantics unchanged there). Returned trees from the host path are
        CPU-committed; _place_state stages them once."""
        from dlsg_tpu.utils.hostinit import init_on_host

        if self.num_hosts > 1:
            return model.init(jax.random.PRNGKey(rng_seed), *args)
        return init_on_host(model, jax.random.PRNGKey(rng_seed), *args)

    def _place_state(self, state):
        """Stage a (possibly CPU-committed) TrainState onto the accelerator,
        then apply the tensor-parallel layout. Multi-host runs skip the
        device_put (states were inited on-device there)."""
        if self.num_hosts == 1:
            from dlsg_tpu.utils.hostinit import place_replicated

            state = place_replicated(state, self.mesh)
        return self._apply_tp_layout(state)

    def _slice_batch(self, batch):
        """Host-side trim before staging: regions to num_obj, captions to
        max_words (run_gun.py:158-159)."""
        batch = dict(batch)
        batch["regions"] = batch["regions"][:, :, : self.cfg.num_obj, :]
        batch["captions"] = batch["captions"][:, : self.cfg.max_words]
        return batch

    def _host_batches(self, epoch, num_shards, shard_index):
        """The epoch's host-side batch iterator: in-process by default, or
        the process-parallel assembler when cfg.loader_workers > 0 (the
        reference's DataLoader num_workers, utils/data.py:115-130). The
        worker pool spawns once and persists across epochs; _close_loader()
        releases it at the end of train()."""
        if self.cfg.loader_workers > 0 and hasattr(self.train_dataset, "spawn_spec"):
            if getattr(self, "_parallel_batcher", None) is None:
                from dlsg_tpu.data.parallel_loader import ParallelBatcher

                self._parallel_batcher = ParallelBatcher(
                    self.train_dataset,
                    self.cfg.train_batch_size,
                    num_workers=self.cfg.loader_workers,
                )
            return self._parallel_batcher.epoch_batches(
                seed=self.cfg.seed,
                epoch=epoch,
                shard_index=shard_index,
                num_shards=num_shards,
            )
        return train_batches(
            self.train_dataset,
            self.cfg.train_batch_size,
            seed=self.cfg.seed,
            epoch=epoch,
            shard_index=shard_index,
            num_shards=num_shards,
        )

    def _close_loader(self):
        if getattr(self, "_parallel_batcher", None) is not None:
            self._parallel_batcher.close()
            self._parallel_batcher = None

    def _batches(self, epoch, num_shards, shard_index):
        """Sharded, shuffled, device-prefetched training batches."""
        from dlsg_tpu.data.prefetch import prefetch_to_device

        host = (
            self._slice_batch(b)
            for b in self._host_batches(epoch, num_shards, shard_index)
        )
        return prefetch_to_device(host, self.mesh, stage_dtype=self.cfg.stage_dtype)

    def _print(self, *args):
        if self.is_leader:
            print(*args)

    def _run_eval(self, variables, epoch: int, global_step: int):
        with self.stopwatch.span("eval"):
            return self._run_eval_inner(variables, epoch, global_step)

    def _run_eval_inner(self, variables, epoch: int, global_step: int):
        cfg = self.cfg
        t0 = time.time()
        if self.eval_mesh is not self.mesh:
            # multi-host: params are committed to the GLOBAL train mesh after
            # the first step, but decode_fn is jitted over the LOCAL eval mesh
            # — mixing the device sets raises 'Received incompatible devices'.
            from dlsg_tpu.evaluation.evaluate import reshard_for_local_eval

            variables = reshard_for_local_eval(variables, self.eval_mesh)
        eval_iter = eval_batches(
            self.eval_dataset,
            cfg.test_batch_size,
            shard_index=jax.process_index(),
            num_shards=self.num_hosts,
        )
        scores, results, alpha_all, infer_time = evaluate(
            self.decode_fn,
            variables,
            eval_iter,
            self.vocab,
            self.test_reference,
            cross_host_gather=self.num_hosts > 1,
            stage_dtype=self.cfg.stage_dtype,
        )
        self._print(f"evaluate time: {time.time() - t0:.3f}s (inference {infer_time:.3f}s)")
        if alpha_all is not None and self.is_leader:
            # heatmap of the first clip's proposal attention (run_gun.py:455-465)
            from dlsg_tpu.utils.plots import plot_alpha_all

            first_vid, first_cap = next(iter(results.items()))
            plot_alpha_all(
                alpha_all[:1],
                cfg.num_proposals,
                title=first_cap,
                out_dir=f"{cfg.result_dir}/{self.base_name}/images",
                epoch=epoch,
                step=global_step,
                vid=int(first_vid),
            )
        for tag in ("Bleu_4", "METEOR", "CIDEr", "ROUGE_L"):
            if tag in scores:
                self.writer.add_scalar(f"results/{tag}", scores[tag], global_step)
        trigger = self.result_handler.update_result([scores], [results], epoch)
        return scores, trigger


class RunGAN(_TrainerBase):
    """Full D-LSG adversarial trainer (run_gun.py:19-320)."""

    def __init__(self, cfg, vocab, train_dataset, eval_dataset, test_reference, **kw):
        super().__init__(cfg, vocab, train_dataset, eval_dataset, test_reference, **kw)
        cfg = self.cfg
        V = len(vocab)
        self.gen_model = CapGnnModel(cfg, V)
        self.use_visual_gan = cfg.use_visual_gan
        sample = self._sample_batch()
        g_vars = self._init_params(
            self.gen_model, cfg.seed, sample["frames"], sample["regions"], sample["captions"]
        )
        self.gen_state = TrainState.create(
            self._maybe_graft_glove(g_vars["params"]), self._gen_optimizer()
        )
        if self.use_visual_gan:
            self.disc_model = DiscV2(cfg, V)
            onehot = np.zeros((cfg.train_batch_size, cfg.max_words, V), np.float32)
            att_mask = np.ones(
                (cfg.train_batch_size, cfg.max_words, cfg.max_words), np.float32
            )
            alpha = np.ones(
                (cfg.train_batch_size, cfg.max_words, 2 * cfg.num_proposals), np.float32
            )
            obj = np.zeros(
                (cfg.train_batch_size, cfg.num_proposals, cfg.visual_hidden_size),
                np.float32,
            )
            d_vars = self._init_params(
                self.disc_model, cfg.seed + 1, onehot, obj, obj, att_mask, alpha
            )
            self.disc_state = TrainState.create(
                d_vars["params"], make_optimizer(cfg.learning_rate)
            )
            self.gan_step = make_gan_train_step(
                self.gen_model, self.disc_model, cfg, self.mesh
            )
        self.ce_step = make_ce_train_step(self.gen_model, cfg, self.mesh)
        # eval decode is sharded over the mesh data axis (the reference's
        # 4-GPU eval fan-out, run_gun.py:269-281)
        self.decode_fn = make_decode_fn(
            self.gen_model, cfg, return_alpha=cfg.plot_attention, mesh=self.eval_mesh
        )

        # device-side adaptive lambda state (exact run_gun.py:210-231 ordering)
        self.lambda_state = init_lambda_state(cfg.lambda_D_visual)

        # resume (run_gun.py:53-61)
        if self.resume_epoch is not None:
            restored = ckpt.restore_train(
                cfg.checkpoint_dir,
                self.resume_epoch,
                self.gen_state,
                self.disc_state if self.use_visual_gan else None,
                lambda_state=self.lambda_state,
            )
            self.gen_state = restored["gen_state"]
            if self.use_visual_gan:
                self.disc_state = restored["disc_state"]
                if restored.get("gan_lambda_state") is not None:
                    self.lambda_state = restored["gan_lambda_state"]
            self.last_epoch = restored["epoch"]
        self.gen_state = self._place_state(self.gen_state)
        if self.use_visual_gan and self.num_hosts == 1:
            from dlsg_tpu.utils.hostinit import place_replicated

            self.disc_state = place_replicated(self.disc_state, self.mesh)

    def train(self, num_shards: int = 1, shard_index: int = 0) -> ResultHandler:
        cfg = self.cfg
        total_step = max(1, len(self.train_dataset) // cfg.train_batch_size // num_shards)
        loss_count = loss_count_g = loss_count_d = 0.0

        for epoch in range(self.last_epoch + 1, cfg.epoch_num):
            start_time = time.time()
            self.rng = jax.random.fold_in(self._base_rng, epoch)
            # MultiStepLR (run_gun.py:94-104)
            g_lr = multistep_lr(cfg.learning_rate, G_LR_MILESTONES, LR_GAMMA, epoch)
            d_lr = multistep_lr(cfg.learning_rate, D_LR_MILESTONES, LR_GAMMA, epoch)
            self.gen_state = self.gen_state.set_learning_rate(g_lr)
            if self.use_visual_gan:
                self.disc_state = self.disc_state.set_learning_rate(d_lr)
            self._print(f"Epoch-{epoch} lr: {g_lr}")
            if self.use_visual_gan:
                self._print(f"Epoch-{epoch} lr visual GAN: {d_lr}")
            schedule = saving_schedule(epoch, total_step, cfg.dataset)
            epsilon = scheduled_sampling_epsilon(cfg.ss_factor, epoch, "msvd")

            # One-step-lagged metric consumption: step i's decode of metrics
            # (the only host sync) happens AFTER step i+1 has been dispatched,
            # so the device->host fetch + logging overlap the next step's
            # device time instead of serializing with it (a full relay RTT
            # per step in this environment). Log content and ordering are
            # identical to the eager loop.
            def _consume(p):
                nonlocal loss_count, loss_count_g, loss_count_d
                i, global_step, metrics, vid0, caps = p
                cap_loss = float(metrics["cap_loss"])  # host sync
                if self.use_visual_gan:
                    gan_lambda = float(metrics["gan_lambda"])
                    loss_count_g += float(metrics["loss_G"])
                    loss_count_d += float(metrics["loss_D"])
                    self.writer.add_scalar("Loss/G_v_loss", float(metrics["loss_G"]), global_step)
                    self.writer.add_scalar("Loss/D_loss_visual", float(metrics["loss_D"]), global_step)
                    self.writer.add_scalar(
                        "Loss/wasserstein_visual", float(metrics["wasserstein"]), global_step
                    )
                    self.writer.add_scalar("parameter/gan_lambda", gan_lambda, global_step)
                loss_count += cap_loss
                self.writer.add_scalar("Loss/cap_loss", cap_loss, global_step)

                if i % cfg.log_every == 0:  # run_gun.py:236-261
                    n = float(cfg.log_every)
                    msg = (
                        f"Epoch [{epoch}/{cfg.epoch_num}], Step [{i}/{total_step}], "
                        f"Loss: {loss_count / n:.4f}, "
                        f"Perplexity: {np.exp(loss_count / n):.4f}"
                    )
                    if self.use_visual_gan:
                        msg += f", loss_G: {loss_count_g / n:.4f}, loss_D: {loss_count_d / n:.4f}"
                    loss_count = loss_count_g = loss_count_d = 0.0
                    self._print(msg)
                    we = self.vocab.decode_tokens(np.asarray(metrics["sample_tokens"]))
                    # caps may be device-staged (prefetch_to_device); fetch
                    # row 0 here, on log steps only — fetching it every step
                    # in the loop body would re-add the per-step relay sync
                    # the lagged-consume structure exists to avoid
                    gt = self.vocab.decode_tokens(np.asarray(caps[0]))
                    self._print(f"[vid:{vid0}]")
                    self._print(f"WE: {we}\nGT: {gt}")

            pending = None
            for i, batch in enumerate(self._batches(epoch, num_shards, shard_index), start=1):
                if cfg.dataset == "msr-vtt":  # per-step variant (run_gun.py:149-151)
                    epsilon = scheduled_sampling_epsilon(
                        cfg.ss_factor, epoch, "msr-vtt", i, total_step
                    )
                global_step = i + epoch * total_step
                self.rng, step_rng = jax.random.split(self.rng)
                step_batch = {
                    k: batch[k] for k in ("frames", "regions", "captions", "lengths")
                }

                # device trace of steps 3..5 of the first epoch, leader only
                # (multi-host runs must not race into one profile_dir)
                if (
                    cfg.profile_dir and self.is_leader and not self._trace_active
                    and epoch == self.last_epoch + 1 and i == 3
                ):
                    jax.profiler.start_trace(cfg.profile_dir)
                    self._trace_active = True
                with self.stopwatch.span("train_step"):
                    if self.use_visual_gan:
                        self.gen_state, self.disc_state, self.lambda_state, metrics = self.gan_step(
                            self.gen_state,
                            self.disc_state,
                            self.lambda_state,
                            step_batch,
                            step_rng,
                            jnp.float32(epsilon),
                        )
                    else:
                        self.gen_state, metrics = self.ce_step(
                            self.gen_state, step_batch, step_rng, jnp.float32(epsilon)
                        )
                    if pending is not None:
                        _consume(pending)  # syncs on step i-1 while i runs
                pending = (
                    i, global_step, metrics,
                    int(batch["video_ids"][0]), batch["captions"],
                )
                if self._trace_active and i >= 5:
                    _consume(pending)  # let step i finish so the trace is whole
                    pending = None
                    jax.profiler.stop_trace()
                    self._trace_active = False

                if i in schedule:  # mid-epoch eval (run_gun.py:262-310)
                    if pending is not None:
                        _consume(pending)
                        pending = None
                    variables = {"params": self.gen_state.params}
                    scores, trigger = self._run_eval(variables, epoch, global_step)
                    if trigger and self.is_leader and self.result_handler.save_enabled:
                        ckpt.save_model(cfg.checkpoint_dir, f"best_{trigger}", self.gen_state.params)
                    if self.is_leader and self.result_handler.save_enabled:
                        ckpt.save_train(
                            cfg.checkpoint_dir,
                            epoch,
                            self.gen_state,
                            self.disc_state if self.use_visual_gan else None,
                            lambda_state=self.lambda_state,
                        )

            if pending is not None:  # flush the last step's lagged metrics
                _consume(pending)
                pending = None
            if self._trace_active:  # epoch had <5 batches; don't leak the trace
                jax.profiler.stop_trace()
                self._trace_active = False
            self.result_handler.print_results()
            self._print(f"*******One epoch time: {time.time() - start_time:.3f}s*******")
            self._print(self.stopwatch.report() + "\n")
        self._close_loader()
        return self.result_handler


class Run(_TrainerBase):
    """CE-only baseline trainer over CapBaseline1 (run_graph.py:16-200)."""

    def __init__(self, cfg, vocab, train_dataset, eval_dataset, test_reference, **kw):
        super().__init__(cfg, vocab, train_dataset, eval_dataset, test_reference, **kw)
        cfg = self.cfg
        self.gen_model = CapBaseline1(cfg, len(vocab))
        sample = self._sample_batch()
        g_vars = self._init_params(
            self.gen_model, cfg.seed, sample["frames"], sample["regions"], sample["captions"]
        )
        self.gen_state = self._place_state(
            TrainState.create(
                self._maybe_graft_glove(g_vars["params"]), self._gen_optimizer()
            )
        )
        self.ce_step = make_ce_train_step(self.gen_model, cfg, self.mesh)
        # the reference's baseline trainer scores through the same beam-sized
        # evaluate() as the GAN trainer (run_graph.py:183, beam from opt.py:22)
        self.decode_fn = make_decode_fn(
            self.gen_model, cfg, beam_size=cfg.beam_size, mesh=self.eval_mesh
        )

    def train(self, num_shards: int = 1, shard_index: int = 0) -> ResultHandler:
        cfg = self.cfg
        total_step = max(1, len(self.train_dataset) // cfg.train_batch_size // num_shards)
        loss_count = 0.0
        for epoch in range(self.last_epoch + 1, cfg.epoch_num):
            start = time.time()
            self.rng = jax.random.fold_in(self._base_rng, epoch)
            lr = multistep_lr(cfg.learning_rate, G_LR_MILESTONES, LR_GAMMA, epoch)
            self.gen_state = self.gen_state.set_learning_rate(lr)
            self._print(f"Epoch-{epoch} lr: {lr}")
            epsilon = scheduled_sampling_epsilon(cfg.ss_factor, epoch)
            schedule = saving_schedule(epoch, total_step, cfg.dataset)
            # same one-step-lagged metric consumption as RunGAN.train: the
            # host sync on step i's loss happens after step i+1 is dispatched
            def _consume(p):
                nonlocal loss_count
                i, metrics = p
                cap_loss = float(metrics["cap_loss"])  # host sync
                loss_count += cap_loss
                self.writer.add_scalar("Loss/cap_loss", cap_loss, i + epoch * total_step)
                if i % cfg.log_every == 0:
                    n = float(cfg.log_every)
                    self._print(
                        f"Epoch [{epoch}/{cfg.epoch_num}], Step [{i}/{total_step}], "
                        f"Loss: {loss_count / n:.4f}, Perplexity: {np.exp(loss_count / n):.4f}"
                    )
                    loss_count = 0.0

            pending = None
            for i, batch in enumerate(self._batches(epoch, num_shards, shard_index), start=1):
                self.rng, step_rng = jax.random.split(self.rng)
                step_batch = {
                    k: batch[k] for k in ("frames", "regions", "captions", "lengths")
                }
                self.gen_state, metrics = self.ce_step(
                    self.gen_state, step_batch, step_rng, jnp.float32(epsilon)
                )
                if pending is not None:
                    _consume(pending)  # syncs on step i-1 while i runs
                pending = (i, metrics)
                if i in schedule:
                    _consume(pending)
                    pending = None
                    variables = {"params": self.gen_state.params}
                    self._run_eval(variables, epoch, i + epoch * total_step)
            if pending is not None:
                _consume(pending)
            self.result_handler.print_results()
            self._print(f"*******One epoch time: {time.time() - start:.3f}s*******\n")
        self._close_loader()
        return self.result_handler


class RunLegacy(_TrainerBase):
    """Frames-only legacy trainer over CapModel (reference run.py:16-128)."""

    def __init__(self, cfg, vocab, train_dataset, eval_dataset, test_reference, **kw):
        super().__init__(cfg, vocab, train_dataset, eval_dataset, test_reference, **kw)
        cfg = self.cfg
        from dlsg_tpu.models.generator import CapModel
        from dlsg_tpu.ops.losses import masked_cross_entropy
        from dlsg_tpu.train.steps import _model_rngs

        self.gen_model = CapModel(cfg, len(vocab))
        sample = self._sample_batch()
        g_vars = self._init_params(
            self.gen_model, cfg.seed, sample["frames"], sample["captions"]
        )
        self.gen_state = self._place_state(
            TrainState.create(g_vars["params"], make_optimizer(cfg.learning_rate))
        )
        model = self.gen_model

        def step(state, batch, rng, epsilon):
            def loss_fn(params):
                out = model.apply(
                    {"params": params},
                    batch["frames"],
                    batch["captions"],
                    epsilon,
                    False,
                    rngs=_model_rngs(rng, state.step),
                )
                loss = masked_cross_entropy(out, batch["captions"], batch["lengths"])
                return loss, jnp.argmax(out[0], axis=-1)

            (loss, sample_toks), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return state.apply_gradients(grads), {
                "cap_loss": loss,
                "sample_tokens": sample_toks,
            }

        self.ce_step = jax.jit(step, donate_argnums=0)

        if cfg.beam_size > 1:
            # reference legacy eval beam-decodes too (evaluate.py:70-72 ->
            # Decoder beam path, beam size from opt.py:22)
            self.decode_fn = make_decode_fn(
                model, cfg, beam_size=cfg.beam_size, mesh=self.eval_mesh
            )
        else:

            def decode(variables, frames, regions):
                out = model.apply(variables, frames, None)
                return out

            self.decode_fn = jax.jit(decode)

    train = Run.train
