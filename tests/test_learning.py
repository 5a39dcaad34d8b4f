"""Learning signal test: the full GAN system must actually fit synthetic data.

Distinct random features per video with fixed captions are memorizable; after a
few hundred CE+GAN steps the model should reproduce training captions and the
caption metrics should rise well above the untrained baseline. This is the
closest thing to the reference's in-loop WE/GT self-check (run_gun.py:250-261),
made quantitative.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.data.loader import eval_batches, train_batches
from dlsg_tpu.data.synthetic import SyntheticDataset, make_vocab
from dlsg_tpu.evaluation.evaluate import evaluate, make_decode_fn
from dlsg_tpu.metrics.scorer import COCOScorer
from dlsg_tpu.models.discriminator import DiscV2
from dlsg_tpu.models.generator import CapGnnModel
from dlsg_tpu.train.gan_lambda import init_lambda_state
from dlsg_tpu.train.optim import TrainState, make_optimizer
from dlsg_tpu.train.steps import make_gan_train_step, make_masks


@pytest.mark.slow
@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_gan_training_fits_synthetic_data(compute_dtype):
    cfg = tiny_test_config(
        compute_dtype=compute_dtype,
        train_batch_size=8,
        test_batch_size=8,
        beam_size=2,
        visual_hidden_size=64,
        region_projected_size=64,
        query_hidden_size=64,
        decode_hidden_size=64,
        word_size=32,
    )
    vocab = make_vocab()
    V = len(vocab)
    ds = SyntheticDataset(cfg, vocab, num_videos=8, captions_per_video=1, seed=3)

    gen = CapGnnModel(cfg, V)
    disc = DiscV2(cfg, V)
    batch0 = next(train_batches(ds, cfg.train_batch_size, seed=0, epoch=0))
    frames = jnp.asarray(batch0["frames"])
    regions = jnp.asarray(batch0["regions"])
    captions = jnp.asarray(batch0["captions"])
    g_vars = gen.init(jax.random.PRNGKey(0), frames, regions, captions)
    onehot = jax.nn.one_hot(captions, V)
    _, att = make_masks(captions)
    alpha = jnp.ones((cfg.train_batch_size, cfg.max_words, 2 * cfg.num_proposals))
    obj = jnp.zeros((cfg.train_batch_size, cfg.num_proposals, cfg.visual_hidden_size))
    d_vars = disc.init(jax.random.PRNGKey(1), onehot, obj, obj, att, alpha)

    gstate = TrainState.create(g_vars["params"], make_optimizer(3e-3))
    dstate = TrainState.create(d_vars["params"], make_optimizer(3e-4))
    step = make_gan_train_step(gen, disc, cfg)
    lstate = init_lambda_state(0.002)

    decode_fn = make_decode_fn(gen, cfg, beam_size=cfg.beam_size)

    def score_now(gstate):
        scores, results, _, _ = evaluate(
            decode_fn,
            {"params": gstate.params},
            eval_batches(ds.eval_view(), cfg.test_batch_size),
            vocab,
            ds.references,
            scorer=COCOScorer(),
        )
        return scores

    before = score_now(gstate)

    losses = []
    rng = jax.random.PRNGKey(42)
    for epoch in range(60):
        for batch in train_batches(ds, cfg.train_batch_size, seed=0, epoch=epoch):
            dev = {
                k: jnp.asarray(v)
                for k, v in batch.items()
                if k in ("frames", "regions", "captions", "lengths")
            }
            rng, k = jax.random.split(rng)
            gstate, dstate, lstate, m = step(
                gstate, dstate, lstate, dev, k, jnp.float32(1.0)
            )
            losses.append(float(m["cap_loss"]))

    after = score_now(gstate)
    # CE must fall hard (memorization) ...
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    # ... and decoded captions must beat the untrained model by a wide margin
    assert after["Bleu_1"] > max(0.5, before["Bleu_1"] + 0.3), (before, after)
    assert after["CIDEr"] > before["CIDEr"] + 0.5, (before, after)
