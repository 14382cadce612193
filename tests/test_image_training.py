import jax
import jax.numpy as jnp
import numpy as np

from lmsfc_tpu.models.image_codec import FactorizedPrior
from lmsfc_tpu.training.train_image import create_image_train_state, make_image_train_step


def test_image_rd_training_decreases_loss():
    model = FactorizedPrior(num_filters=8, latent_filters=12, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, 32, 32, 3)).astype(np.float32))
    state = create_image_train_state(model, x[:1], learning_rate=1e-3)
    step = make_image_train_step(model, lmbda=0.01)
    key = jax.random.key(0)
    losses = []
    for _ in range(20):
        key, sub = jax.random.split(key)
        state, m = step(state, x, sub)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
