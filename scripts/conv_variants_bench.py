"""Measure candidate ez_conv grad-step formulations on the chip.

The round-4 profile (profile_conv_learner_out.json) pinned the SPI=32
ez_conv learner as gradient-bound: 0.763 ms/update for a 22.7 GF update
(XLA cost analysis, scripts/conv_flops_analysis.py) — ~30 TF/s achieved,
with 1.1 GB of (pre-fusion) bytes accessed, i.e. the step sits near the
HBM roofline, not the MXU one. Candidates target the traffic:

  v0_baseline    current f32 muzero_loss
  v1_bf16        network applies in bf16 (params+activations), loss f32
  v2_remat       jax.checkpoint on the repr/dyn applies (recompute > store)
  v3_bf16_remat  both

In-jit scan-loop methodology (single dispatches over the axon tunnel are
~30 ms floor noise).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

BATCH = 256
L = 5
OBS = (80, 40, 1)
UPDATES = 64


def sync(x):
  return float(jnp.asarray(x).reshape(-1)[0])


def best_of(f, n=3):
  ts = []
  for _ in range(n):
    t0 = time.time()
    f()
    ts.append(time.time() - t0)
  return min(ts)


def make_batch(rng):
  from muax_tpu.types import Transition
  ks = jax.random.split(rng, 4)
  return Transition(
      obs=jax.random.uniform(ks[0], (BATCH, L) + OBS),
      action=jax.random.randint(ks[1], (BATCH, L), 0, 3),
      reward=jax.random.normal(ks[2], (BATCH, L)) * 0.1,
      done=jnp.zeros((BATCH, L), bool),
      rn=jax.random.normal(ks[3], (BATCH, L)),
      value=jnp.zeros((BATCH, L)),
      pi=jnp.full((BATCH, L, 3), 1 / 3),
      mask=jnp.ones((BATCH, L)),
      weight=jnp.ones((BATCH,)),
  )


def main():
  from muax_tpu.models import make_efficientzero_networks, muzero_optimizer
  from muax_tpu.models.losses import muzero_loss
  from muax_tpu.train.learner import TrainState

  networks = make_efficientzero_networks(num_actions=3, support_size=20,
                                         channels=32, num_blocks=2)
  optimizer = muzero_optimizer()
  rng = jax.random.PRNGKey(0)
  params = networks.init_params(rng, jnp.zeros((1,) + OBS))
  ts0 = TrainState(params=params, opt_state=optimizer.init(params),
                   step=jnp.asarray(0, jnp.int32))
  batch = make_batch(jax.random.PRNGKey(1))

  def variant_loss(name):
    if name == "v0_baseline":
      return lambda p: muzero_loss(p, batch, networks)
    if name == "v1_bf16":
      return lambda p: muzero_loss(p, batch, networks,
                                   compute_dtype=jnp.bfloat16)
    if name == "v2_remat":
      return lambda p: muzero_loss(p, batch, networks, remat=True)
    if name == "v3_bf16_remat":
      return lambda p: muzero_loss(p, batch, networks,
                                   compute_dtype=jnp.bfloat16, remat=True)
    raise ValueError(name)

  results = {"batch": BATCH, "unroll": L, "obs": list(OBS),
             "updates_timed": UPDATES,
             "device": str(jax.devices()[0]), "per_update_ms": {}}

  for name in ["v0_baseline", "v1_bf16", "v2_remat", "v3_bf16_remat"]:
    loss_fn = variant_loss(name)

    @jax.jit
    def scan(ts, loss_fn=loss_fn):
      def body(ts, _):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(ts.params)
        updates_, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates_)
        new_params = new_params._replace(temperature=ts.params.temperature)
        return TrainState(new_params, opt_state, ts.step + 1), metrics.total
      ts, losses = jax.lax.scan(body, ts, None, length=UPDATES)
      return losses[-1]

    print(f"[v] compiling {name}", file=sys.stderr, flush=True)
    t0 = time.time()
    sync(scan(ts0))
    compile_s = time.time() - t0
    ms = best_of(lambda: sync(scan(ts0))) / UPDATES * 1e3
    results["per_update_ms"][name] = round(ms, 3)
    print(f"{name}: {ms:.3f} ms/update (compile {compile_s:.0f}s)",
          flush=True)

  print(json.dumps(results, indent=1))
  with open("/root/repo/scripts/conv_variants_bench_out.json", "w") as f:
    json.dump(results, f, indent=1)


if __name__ == "__main__":
  main()
