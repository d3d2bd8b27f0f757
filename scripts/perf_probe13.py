"""TPU probe 13: honest train baselines + bf16-one-hot-build mp variant.

Round-1's 237/266 ms train numbers were mis-measured (probe_bis1: the very
commit claiming 237 measures 4911). Real numbers: f32 b2 = 3632, mp-auto
b2 = 2038. This probe measures (1) f32 b1, (2) mp b2 with the one-hot W
built DIRECTLY in bf16 (no f32 build + cast; candidate to cut the mp
sampling cost), (3) mp b1.

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python perf_probe13.py > /tmp/probe13.log 2>&1 &
"""

from __future__ import annotations

import time

import numpy as np


def patched_core(w_dtype):
    """Copy of ms_deform_attn_core's onehot branch with W built in w_dtype
    (levels here are all onehot at canonical sizes: onehot_max_s=8192 covers
    7500/1900/475)."""
    import jax
    import jax.numpy as jnp

    def core(value, spatial_shapes, sampling_locations, attention_weights,
             query_chunk=None, onehot_max_s=8192):
        B, S, nH, D = value.shape
        _, Lq, _, L, P, _ = sampling_locations.shape
        compute_dtype = value.dtype
        if query_chunk is None:
            query_chunk = max(256, (1024 * 4) // max(B, 1))
        levels = []
        start = 0
        for (h, w) in spatial_shapes:
            v = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
            start += h * w
            levels.append(v.transpose(0, 2, 1, 3))       # [B,H,S,D]

        def sample_chunk(loc_c, attn_c):
            C = loc_c.shape[1]
            out = jnp.zeros((B, nH, C, D), jnp.float32)
            for lvl, (h, w) in enumerate(spatial_shapes):
                buf = levels[lvl]
                loc = loc_c[:, :, :, lvl]
                attn = attn_c[:, :, :, lvl]
                x = loc[..., 0].astype(jnp.float32) * w - 0.5
                y = loc[..., 1].astype(jnp.float32) * h - 0.5
                x0 = jnp.floor(x)
                y0 = jnp.floor(y)
                fx = x - x0
                fy = y - y0
                cws, ids = [], []
                for dy in (0, 1):
                    for dx in (0, 1):
                        cw = ((1.0 - jnp.abs(fx - dx))
                              * (1.0 - jnp.abs(fy - dy)))
                        valid = ((x0 + dx >= 0) & (x0 + dx < w)
                                 & (y0 + dy >= 0) & (y0 + dy < h))
                        cws.append(cw * valid.astype(cw.dtype))
                        xi = jnp.clip(x0 + dx, 0, w - 1)
                        yi = jnp.clip(y0 + dy, 0, h - 1)
                        ids.append((yi * w + xi).astype(jnp.int32))
                cw = (jnp.stack(cws, -1)
                      * attn.astype(jnp.float32)[..., None])
                cw_t = cw.transpose(0, 2, 1, 3, 4).astype(w_dtype)
                idst = jnp.stack(ids, -1).transpose(0, 2, 1, 3, 4)
                idst = idst.reshape(B, nH, C * P, 4)
                wgt = cw_t.reshape(B, nH, C * P, 4)
                iota = jnp.arange(h * w, dtype=jnp.int32)
                W = jnp.zeros((B, nH, C * P, h * w), w_dtype)
                for c in range(4):
                    W = W + jnp.where(
                        idst[..., c, None] == iota[None, None, None, :],
                        wgt[..., c, None], jnp.zeros((), w_dtype))
                part = jax.lax.dot_general(
                    W.astype(buf.dtype), buf,
                    dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32)
                out = out + part.reshape(B, nH, C, P, D).sum(3)
            return out.transpose(0, 2, 1, 3).reshape(B, C, nH * D)

        n_chunks = -(-Lq // query_chunk)
        Lq_pad = n_chunks * query_chunk
        pad = [(0, 0), (0, Lq_pad - Lq)] + [(0, 0)] * 4
        loc_p = jnp.pad(sampling_locations, pad)
        attn_p = jnp.pad(attention_weights, pad[:-1])
        loc_s = loc_p.reshape(B, n_chunks, query_chunk,
                              *loc_p.shape[2:]).swapaxes(0, 1)
        attn_s = attn_p.reshape(B, n_chunks, query_chunk,
                                *attn_p.shape[2:]).swapaxes(0, 1)
        chunk_fn = jax.checkpoint(sample_chunk)

        def body(_, inp):
            lc, ac = inp
            return None, chunk_fn(lc, ac)

        _, chunks = jax.lax.scan(body, None, (loc_s, attn_s))
        out = chunks.swapaxes(0, 1).reshape(B, Lq_pad, nH * D)[:, :Lq]
        return out.astype(compute_dtype)

    return core


def run(tag, impl, mp, batch_size, patch_dtype=None):
    import jax

    from snipper_tpu.config import Config
    from snipper_tpu.data.loader import DataLoader
    from snipper_tpu.data.synthetic import SyntheticDataset
    from snipper_tpu.losses.criterion import SetCriterion
    from snipper_tpu.models.snipper import init_model
    from snipper_tpu.train.state import create_train_state
    from snipper_tpu.train.step import make_train_step

    import snipper_tpu.ops.deform_attn as da

    orig = da.ms_deform_attn_core
    if patch_dtype is not None:
        da.ms_deform_attn_core = patched_core(patch_dtype)
    try:
        cfg = Config.canonical_t4_f2().replace(deform_impl=impl)
        model, params = init_model(cfg, jax.random.PRNGKey(1))
        crit = SetCriterion(cfg)
        state, tx = create_train_state(cfg, params, steps_per_epoch=100)
        step = make_train_step(model, crit, tx, mixed_precision=mp)
        loader = DataLoader(SyntheticDataset(cfg, n_samples=batch_size),
                            batch_size, shuffle=False, process_index=0,
                            process_count=1)
        raw = next(iter(loader))
        batch = {"images": raw["images"], "targets": raw["targets"]}
        rng = jax.random.PRNGKey(2)
        t0 = time.perf_counter()
        state, m = step(state, batch, rng)
        loss0 = float(m["loss_total"])
        compile_s = time.perf_counter() - t0
        K = 4
        t0 = time.perf_counter()
        for _ in range(K):
            state, m = step(state, batch, rng)
        loss1 = float(m["loss_total"])
        ms = (time.perf_counter() - t0) / K * 1e3
        print(f"{tag}: {ms:.1f} ms/step (compile {compile_s:.0f}s, "
              f"loss {loss0:.1f}->{loss1:.1f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAIL {type(e).__name__}: {e}"[:200], flush=True)
    finally:
        da.ms_deform_attn_core = orig


def main():
    import jax.numpy as jnp

    run("f32 xla b1", "xla", False, 1)
    run("mp-auto xla b1", "xla", True, 1)
    run("mp-auto bf16-W xla b2", "xla", True, 2, patch_dtype=jnp.bfloat16)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
