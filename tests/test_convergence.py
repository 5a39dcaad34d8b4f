"""Convergence evidence beyond memorization (VERDICT round 1, item 6).

(a) held-out generalization: on StructuredSyntheticDataset the caption is a
    function of the features (class prototype + noise), so scoring UNSEEN
    noise draws separates learning the mapping from memorizing videos;
(b) GAN-dynamics ablation: the WGAN-GP machinery must actually train — the
    gradient penalty must pull the critic's interpolate-gradient norm toward 1
    and the wasserstein estimate must separate real from fake — and GAN
    training must not degrade captions vs a CE-only run of the same length
    (the reference's in-loop self-checks, run_gun.py:250-261,339-398).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.data.loader import eval_batches, train_batches
from dlsg_tpu.data.synthetic import StructuredSyntheticDataset, make_vocab
from dlsg_tpu.evaluation.evaluate import evaluate, make_decode_fn
from dlsg_tpu.metrics.scorer import COCOScorer
from dlsg_tpu.models.discriminator import DiscV2
from dlsg_tpu.models.generator import CapGnnModel
from dlsg_tpu.train.gan_lambda import init_lambda_state
from dlsg_tpu.train.optim import TrainState, make_optimizer
from dlsg_tpu.train.steps import make_ce_train_step, make_gan_train_step, make_masks


def _cfg():
    return tiny_test_config(
        train_batch_size=8,
        test_batch_size=8,
        beam_size=2,
        visual_hidden_size=64,
        region_projected_size=64,
        query_hidden_size=64,
        decode_hidden_size=64,
        word_size=32,
    )


def _score(decode_fn, params, view, refs, vocab, bs):
    scores, _, _, _ = evaluate(
        decode_fn,
        {"params": params},
        eval_batches(view, bs),
        vocab,
        refs,
        scorer=COCOScorer(),
    )
    return scores


@pytest.mark.slow
def test_heldout_generalization_ce():
    """Train CE on 4 classes x 4 videos; unseen noise draws of the same
    prototypes must decode to the class captions."""
    cfg = _cfg()
    vocab = make_vocab()
    V = len(vocab)
    ds = StructuredSyntheticDataset(
        cfg, vocab, num_classes=4, train_per_class=4, heldout_per_class=2,
        noise=0.3, seed=7,
    )

    gen = CapGnnModel(cfg, V)
    b0 = next(train_batches(ds, cfg.train_batch_size, seed=0, epoch=0))
    g_vars = gen.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b0["frames"]), jnp.asarray(b0["regions"]), jnp.asarray(b0["captions"]),
    )
    state = TrainState.create(g_vars["params"], make_optimizer(3e-3))
    step = make_ce_train_step(gen, cfg)
    decode_fn = make_decode_fn(gen, cfg, beam_size=cfg.beam_size)

    before = _score(decode_fn, state.params, ds.heldout_view(),
                    ds.heldout_references, vocab, cfg.test_batch_size)

    rng = jax.random.PRNGKey(1)
    for epoch in range(60):
        for batch in train_batches(ds, cfg.train_batch_size, seed=0, epoch=epoch):
            dev = {k: jnp.asarray(v) for k, v in batch.items()
                   if k in ("frames", "regions", "captions", "lengths")}
            rng, k = jax.random.split(rng)
            state, m = step(state, dev, k, jnp.float32(1.0))

    train_after = _score(decode_fn, state.params, ds.eval_view(),
                         ds.references, vocab, cfg.test_batch_size)
    held_after = _score(decode_fn, state.params, ds.heldout_view(),
                        ds.heldout_references, vocab, cfg.test_batch_size)

    # it fits the training classes ...
    assert train_after["Bleu_1"] > 0.7, train_after
    # ... and GENERALIZES: unseen feature-noise draws decode to the class
    # captions, far above the untrained baseline
    assert held_after["Bleu_1"] > max(0.6, before["Bleu_1"] + 0.3), (before, held_after)
    assert held_after["CIDEr"] > before["CIDEr"] + 0.5, (before, held_after)

    # int8 quantized inference on the TRAINED model scores on par with fp32
    # (decode_quant='int8', ops/quant.py) — the quality evidence behind the
    # quantized serving path
    from dataclasses import replace

    q8_fn = make_decode_fn(gen, replace(cfg, decode_quant="int8"),
                           beam_size=cfg.beam_size)
    held_q8 = _score(q8_fn, state.params, ds.heldout_view(),
                     ds.heldout_references, vocab, cfg.test_batch_size)
    assert held_q8["Bleu_1"] > held_after["Bleu_1"] - 0.1, (held_after, held_q8)
    assert held_q8["CIDEr"] > held_after["CIDEr"] - 0.5, (held_after, held_q8)


@pytest.mark.slow
def test_gan_dynamics_and_ce_ablation():
    """The discriminator must train (gp -> small, wasserstein separates) and
    GAN captions must not be degenerate vs CE at equal step count."""
    cfg = _cfg()
    vocab = make_vocab()
    V = len(vocab)
    ds = StructuredSyntheticDataset(
        cfg, vocab, num_classes=4, train_per_class=4, heldout_per_class=2,
        noise=0.3, seed=11,
    )

    gen = CapGnnModel(cfg, V)
    disc = DiscV2(cfg, V)
    b0 = next(train_batches(ds, cfg.train_batch_size, seed=0, epoch=0))
    frames = jnp.asarray(b0["frames"])
    regions = jnp.asarray(b0["regions"])
    captions = jnp.asarray(b0["captions"])
    g_vars = gen.init(jax.random.PRNGKey(0), frames, regions, captions)
    onehot = jax.nn.one_hot(captions, V)
    _, att = make_masks(captions)
    alpha = jnp.ones((cfg.train_batch_size, cfg.max_words, 2 * cfg.num_proposals))
    obj = jnp.zeros((cfg.train_batch_size, cfg.num_proposals, cfg.visual_hidden_size))
    d_vars = disc.init(jax.random.PRNGKey(1), onehot, obj, obj, att, alpha)

    # --- GAN run ---
    # keep a copy for the CE ablation: the GAN step donates its TrainState
    # buffers, so g_vars' original arrays are consumed by the first call
    ce_params = jax.tree_util.tree_map(jnp.copy, g_vars["params"])
    gstate = TrainState.create(g_vars["params"], make_optimizer(3e-3))
    dstate = TrainState.create(d_vars["params"], make_optimizer(3e-4))
    gan_step = make_gan_train_step(gen, disc, cfg)
    lstate = init_lambda_state(0.002)
    ws, gps = [], []
    rng = jax.random.PRNGKey(42)
    epochs = 50
    for epoch in range(epochs):
        for batch in train_batches(ds, cfg.train_batch_size, seed=0, epoch=epoch):
            dev = {k: jnp.asarray(v) for k, v in batch.items()
                   if k in ("frames", "regions", "captions", "lengths")}
            rng, k = jax.random.split(rng)
            gstate, dstate, lstate, m = gan_step(
                gstate, dstate, lstate, dev, k, jnp.float32(1.0)
            )
            ws.append(float(m["wasserstein"]))
            gps.append(float(m["grad_penalty"]))

    n = len(ws)
    head, tail = slice(0, n // 5), slice(-n // 5, None)
    # the critic separates real from fake: the wasserstein estimate climbs
    # far above its untrained level (measured trajectory: ~0.2 -> ~45 over
    # 100 steps; scripts/diag_gan_dynamics.py)
    assert np.mean(ws[tail]) > max(5.0, 2 * np.mean(ws[head])), (
        np.mean(ws[head]), np.mean(ws[tail]))
    # gp = E[(||grad D(interp)|| - 1)^2] stays ACTIVE and BOUNDED: as the
    # critic sharpens, interpolate gradients grow and the penalty restrains
    # them near the unit target (measured tail ~1.4, i.e. ||grad|| ~2);
    # without it the critic's Lipschitz constant would run away
    assert 0.01 < np.mean(gps[tail]) < 5.0, np.mean(gps[tail])
    assert np.isfinite(ws).all() and np.isfinite(gps).all()

    # --- CE-only run, same data and step count ---
    ce_state = TrainState.create(ce_params, make_optimizer(3e-3))
    ce_step = make_ce_train_step(gen, cfg)
    rng = jax.random.PRNGKey(43)
    for epoch in range(epochs):
        for batch in train_batches(ds, cfg.train_batch_size, seed=0, epoch=epoch):
            dev = {k: jnp.asarray(v) for k, v in batch.items()
                   if k in ("frames", "regions", "captions", "lengths")}
            rng, k = jax.random.split(rng)
            ce_state, _ = ce_step(ce_state, dev, k, jnp.float32(1.0))

    decode_fn = make_decode_fn(gen, cfg, beam_size=cfg.beam_size)
    gan_scores = _score(decode_fn, gstate.params, ds.heldout_view(),
                        ds.heldout_references, vocab, cfg.test_batch_size)
    ce_scores = _score(decode_fn, ce_state.params, ds.heldout_view(),
                       ds.heldout_references, vocab, cfg.test_batch_size)
    # adversarial training must not collapse captioning: within reach of CE
    assert gan_scores["CIDEr"] > 0.5 * ce_scores["CIDEr"], (ce_scores, gan_scores)
    assert gan_scores["Bleu_1"] > 0.4, gan_scores
