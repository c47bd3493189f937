"""XLA cost analysis for the ez_conv grad+opt update: how many FLOPs does
one SPI=32 gradient step actually contain, and what utilization does the
measured 0.763 ms/update (profile_conv_learner_out.json) imply?

Runs on CPU (cost_analysis is backend-independent for flops).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax


def main():
  from muax_tpu.config import (MuZeroConfig, ReplayConfig, SearchConfig,
                               TrainConfig)
  from muax_tpu.models import make_efficientzero_networks, muzero_optimizer
  from muax_tpu.models.losses import muzero_loss
  from muax_tpu.train.learner import TrainState
  from muax_tpu.types import Transition

  BATCH = 256
  L = 5
  obs_shape = (80, 40, 1)
  networks = make_efficientzero_networks(num_actions=3, support_size=20,
                                         channels=32, num_blocks=2)
  optimizer = muzero_optimizer()
  rng = jax.random.PRNGKey(0)
  params = networks.init_params(rng, jnp.zeros((1,) + obs_shape))
  ts = TrainState(params=params, opt_state=optimizer.init(params),
                  step=jnp.asarray(0, jnp.int32))

  batch = Transition(
      obs=jnp.zeros((BATCH, L) + obs_shape),
      action=jnp.zeros((BATCH, L), jnp.int32),
      reward=jnp.zeros((BATCH, L)),
      done=jnp.zeros((BATCH, L), bool),
      rn=jnp.zeros((BATCH, L)),
      value=jnp.zeros((BATCH, L)),
      pi=jnp.full((BATCH, L, 3), 1 / 3),
      mask=jnp.ones((BATCH, L)),
      weight=jnp.ones((BATCH,)),
  )

  def one_update(ts):
    grads, metrics = jax.grad(
        lambda p: muzero_loss(p, batch, networks), has_aux=True)(ts.params)
    updates_, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
    new_params = optax.apply_updates(ts.params, updates_)
    new_params = new_params._replace(temperature=ts.params.temperature)
    return TrainState(new_params, opt_state, ts.step + 1), metrics.total

  lowered = jax.jit(one_update).lower(ts)
  compiled = lowered.compile()
  ca = compiled.cost_analysis()
  if isinstance(ca, list):
    ca = ca[0]
  flops = ca.get("flops", float("nan"))
  bytes_ = ca.get("bytes accessed", float("nan"))
  ms = 0.763  # measured per-update time on v5e (profile_conv_learner_out)
  print(f"flops/update (XLA):        {flops/1e9:.3f} GF")
  print(f"bytes accessed/update:     {bytes_/1e6:.1f} MB")
  print(f"achieved at 0.763 ms:      {flops/ (ms/1e3) / 1e12:.2f} TF/s")
  print(f"fraction of 197 TF bf16:   {flops/(ms/1e3)/197e12:.4f}")
  print(f"HBM bw at 0.763 ms:        {bytes_/(ms/1e3)/1e9:.1f} GB/s "
        f"(v5e ~819 GB/s)")
  n_params = sum(x.size for x in jax.tree.leaves(params))
  print(f"param count: {n_params}")


if __name__ == "__main__":
  main()
