"""TPU probe 20: decompose the 9.1 ms fixed (non-encoder/decoder) forward
cost — backbone vs input projections vs position encoding vs heads — and
compare against the XLA cost-analysis floor.

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/perf_probe20.py > /tmp/probe20.log 2>&1 &
"""

from __future__ import annotations

import time

import numpy as np


def timeit(fn, *args, K=10):
    import jax.numpy as jnp

    def tiny(out):
        first = out[0] if isinstance(out, (tuple, list)) else out
        # slice ON DEVICE before the host readback — the axon tunnel moves
        # ~200 MB/s, so converting a full activation would swamp the timing
        return np.asarray(first.reshape(-1)[:1].astype(jnp.float32))

    tiny(fn(*args))
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    tiny(out)
    return (time.perf_counter() - t0) / K * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from snipper_tpu.models.resnet import RESNET_SPECS, ResNet

    rng = np.random.default_rng(0)
    B, T, H, W = 1, 4, 600, 800

    for dtype in (jnp.bfloat16, jnp.float32):
        net = ResNet(RESNET_SPECS["resnet50"])
        x = jnp.asarray(rng.uniform(0, 1, (B * T, H, W, 3)), dtype)
        params = net.init(jax.random.PRNGKey(0), x)["params"]
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        fwd = jax.jit(lambda p, x: net.apply({"params": p}, x))
        ms = timeit(lambda p, x: fwd(p, x)[0], params, x)
        cost = fwd.lower(params, x).compile().cost_analysis()
        fl = cost.get("flops", 0) / 1e9
        by = cost.get("bytes accessed", 0) / 1e9
        print(f"backbone {dtype.__name__}: {ms:6.2f} ms  "
              f"cost: {fl:.1f} GFLOP, {by:.2f} GB  "
              f"-> {fl / ms:.1f} TFLOP/s eff", flush=True)

    # stem-only (7x7/2 conv, 3 input channels -> narrow-K MXU)
    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        name="conv1")(x)
            return nn.max_pool(nn.relu(x), (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])

    stem = Stem()
    x = jnp.asarray(rng.uniform(0, 1, (B * T, H, W, 3)), jnp.bfloat16)
    sp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      stem.init(jax.random.PRNGKey(0), x)["params"])
    fs = jax.jit(lambda p, x: stem.apply({"params": p}, x))
    print(f"stem+maxpool bf16: {timeit(fs, sp, x):6.2f} ms", flush=True)

    # full fixed path: model fwd with enc=0, dec=1 minus backbone
    from snipper_tpu.config import Config
    from snipper_tpu.models.snipper import init_model

    cfg = Config.canonical_t4().replace(deform_impl="skip", enc_layers=0,
                                        dec_layers=1)
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    xm = jnp.asarray(rng.uniform(0, 1, (1, T, H, W, 3)), jnp.bfloat16)
    fm = jax.jit(lambda p, x: model.apply({"params": p}, x))
    ms = timeit(lambda p, x: fm(p, x)["pred_logits"], params, xm)
    cost = fm.lower(params, xm).compile().cost_analysis()
    print(f"model(enc0,dec1,skip): {ms:6.2f} ms  "
          f"cost: {cost.get('flops', 0) / 1e9:.1f} GFLOP, "
          f"{cost.get('bytes accessed', 0) / 1e9:.2f} GB", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
