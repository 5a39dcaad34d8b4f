"""Diagnostic: wasserstein / gp trajectories on the structured synthetic set
(CPU), to calibrate tests/test_convergence.py thresholds."""

import jax
import jax.numpy as jnp
import numpy as np

from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.data.loader import train_batches
from dlsg_tpu.data.synthetic import StructuredSyntheticDataset, make_vocab
from dlsg_tpu.models.discriminator import DiscV2
from dlsg_tpu.models.generator import CapGnnModel
from dlsg_tpu.train.gan_lambda import init_lambda_state
from dlsg_tpu.train.optim import TrainState, make_optimizer
from dlsg_tpu.train.steps import make_gan_train_step, make_masks

cfg = tiny_test_config(
    train_batch_size=8, test_batch_size=8, beam_size=2,
    visual_hidden_size=64, region_projected_size=64,
    query_hidden_size=64, decode_hidden_size=64, word_size=32,
)
vocab = make_vocab()
V = len(vocab)
ds = StructuredSyntheticDataset(cfg, vocab, num_classes=4, train_per_class=4,
                                heldout_per_class=2, noise=0.3, seed=11)
gen = CapGnnModel(cfg, V)
disc = DiscV2(cfg, V)
b0 = next(train_batches(ds, cfg.train_batch_size, seed=0, epoch=0))
frames, regions, captions = map(jnp.asarray, (b0["frames"], b0["regions"], b0["captions"]))
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
ws, gps = [], []
rng = jax.random.PRNGKey(42)
for epoch in range(50):
    for batch in train_batches(ds, cfg.train_batch_size, seed=0, epoch=epoch):
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k in ("frames", "regions", "captions", "lengths")}
        rng, k = jax.random.split(rng)
        gstate, dstate, lstate, m = step(gstate, dstate, lstate, dev, k, jnp.float32(1.0))
        ws.append(float(m["wasserstein"]))
        gps.append(float(m["grad_penalty"]))

n = len(ws)
q = n // 5
print("n steps:", n)
print("ws  head/mid/tail:", np.mean(ws[:q]), np.mean(ws[2*q:3*q]), np.mean(ws[-q:]))
print("gps head/mid/tail:", np.mean(gps[:q]), np.mean(gps[2*q:3*q]), np.mean(gps[-q:]))
print("ws first5:", [round(x, 4) for x in ws[:5]])
print("ws last5:", [round(x, 4) for x in ws[-5:]])
print("gp first5:", [round(x, 4) for x in gps[:5]])
print("gp last5:", [round(x, 4) for x in gps[-5:]])
