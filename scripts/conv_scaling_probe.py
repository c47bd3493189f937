"""Discriminate op-overhead vs compute/bandwidth bound for the ez_conv
grad step: time one grad+opt update at batch 32/64/128/256/512/1024.

Flat ms/update => the step is dominated by fixed per-kernel overhead
(hundreds of tiny conv/LN ops); linear => near the roofline already.
Also records the compiled op count and XLA flops at batch 256.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

L = 5
OBS = (80, 40, 1)
UPDATES = 32


def sync(x):
  return float(jnp.asarray(x).reshape(-1)[0])


def best_of(f, n=3):
  ts = []
  for _ in range(n):
    t0 = time.time()
    f()
    ts.append(time.time() - t0)
  return min(ts)


def main():
  from muax_tpu.models import make_efficientzero_networks, muzero_optimizer
  from muax_tpu.models.losses import muzero_loss
  from muax_tpu.train.learner import TrainState
  from muax_tpu.types import Transition

  networks = make_efficientzero_networks(num_actions=3, support_size=20,
                                         channels=32, num_blocks=2)
  optimizer = muzero_optimizer()
  params = networks.init_params(jax.random.PRNGKey(0),
                                jnp.zeros((1,) + OBS))
  ts0 = TrainState(params=params, opt_state=optimizer.init(params),
                   step=jnp.asarray(0, jnp.int32))

  results = {"updates_timed": UPDATES, "device": str(jax.devices()[0]),
             "per_update_ms_by_batch": {}}

  for B in [32, 64, 128, 256, 512, 1024]:
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = Transition(
        obs=jax.random.uniform(ks[0], (B, L) + OBS),
        action=jax.random.randint(ks[1], (B, L), 0, 3),
        reward=jax.random.normal(ks[2], (B, L)) * 0.1,
        done=jnp.zeros((B, L), bool),
        rn=jax.random.normal(ks[2], (B, L)),
        value=jnp.zeros((B, L)),
        pi=jnp.full((B, L, 3), 1 / 3),
        mask=jnp.ones((B, L)),
        weight=jnp.ones((B,)))

    @jax.jit
    def scan(ts, batch=batch):
      def body(ts, _):
        grads, metrics = jax.grad(
            lambda p: muzero_loss(p, batch, networks),
            has_aux=True)(ts.params)
        updates_, opt_state = optimizer.update(grads, ts.opt_state,
                                               ts.params)
        new_params = optax.apply_updates(ts.params, updates_)
        new_params = new_params._replace(temperature=ts.params.temperature)
        return TrainState(new_params, opt_state, ts.step + 1), metrics.total
      ts, losses = jax.lax.scan(body, ts, None, length=UPDATES)
      return losses[-1]

    print(f"[p] compiling B={B}", file=sys.stderr, flush=True)
    sync(scan(ts0))
    ms = best_of(lambda: sync(scan(ts0))) / UPDATES * 1e3
    results["per_update_ms_by_batch"][str(B)] = round(ms, 3)
    print(f"B={B}: {ms:.3f} ms/update", flush=True)

  # Op count + flops of the B=256 single update.
  B = 256
  ks = jax.random.split(jax.random.PRNGKey(1), 3)
  batch = Transition(
      obs=jax.random.uniform(ks[0], (B, L) + OBS),
      action=jax.random.randint(ks[1], (B, L), 0, 3),
      reward=jax.random.normal(ks[2], (B, L)) * 0.1,
      done=jnp.zeros((B, L), bool),
      rn=jax.random.normal(ks[2], (B, L)),
      value=jnp.zeros((B, L)),
      pi=jnp.full((B, L, 3), 1 / 3),
      mask=jnp.ones((B, L)),
      weight=jnp.ones((B,)))

  def one_update(ts):
    grads, metrics = jax.grad(
        lambda p: muzero_loss(p, batch, networks), has_aux=True)(ts.params)
    updates_, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
    new_params = optax.apply_updates(ts.params, updates_)
    return TrainState(new_params, opt_state, ts.step + 1), metrics.total

  compiled = jax.jit(one_update).lower(ts0).compile()
  hlo = compiled.as_text()
  results["fusion_ops"] = hlo.count(" fusion(")
  results["conv_ops"] = hlo.count(" convolution(")
  results["custom_calls"] = hlo.count(" custom-call(")
  ca = compiled.cost_analysis()
  if isinstance(ca, list):
    ca = ca[0]
  results["flops_b256"] = ca.get("flops")
  print(json.dumps(results, indent=1))
  with open("/root/repo/scripts/conv_scaling_probe_out.json", "w") as f:
    json.dump(results, f, indent=1)


if __name__ == "__main__":
  main()
