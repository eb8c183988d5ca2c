"""A/B the deformable gather on chip: XLA row-gather vs pallas kernel.

Production encoder shapes (800-px GroundingDino): levels (100,100), (50,50),
(25,25), (13,13); Q = sum(HW) = 13294 queries; nh=8, dh=32, P=4. Run:

    python scripts/bench_deform.py [batch] [tile_q]

Prints per-level and total ms/batch for both paths plus the projected
imgs/s. (`VLFM_DEFORM_KERNEL=0` makes the model's TPU path fall back to
the XLA rows gather if Mosaic rejects the kernel.) Uses random tables/anchors (the access pattern, not the values,
determines cost).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _enable_compile_cache, pipelined_ms

_enable_compile_cache()

from vlfm_tpu.ops.deform_gather import gather_combine



def xla_rows(table, anchor, w):
    b, r, nh, d4 = table.shape
    dh = d4 // 4
    q, npts = anchor.shape[1], anchor.shape[3]
    idx = anchor.transpose(0, 1, 3, 2).reshape(b, q * npts, nh)
    rows = jnp.take_along_axis(table, idx[..., None], axis=1)
    rows = rows.reshape(b, q, npts, nh, 4, dh)
    return jnp.einsum("bqhpt,bqphtd->bqhd", w, rows)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tile_q = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    nh, dh, npts, q = 8, 32, 4, 13294
    levels = [(100, 100), (50, 50), (25, 25), (13, 13)]

    tot = {"xla": 0.0, "pallas": 0.0}
    for (h, wd) in levels:
        r = (h + 1) * (wd + 1)
        k = jax.random.split(jax.random.PRNGKey(r), 3)
        table = jax.random.normal(k[0], (batch, r, nh, 4 * dh), jnp.float32)
        anchor = jax.random.randint(k[1], (batch, q, nh, npts), 0, r)
        w = jax.random.uniform(k[2], (batch, q, nh, npts, 4), jnp.float32)

        fx = jax.jit(xla_rows)
        fp = jax.jit(lambda t, a, ww: gather_combine(
            t, a, ww, tile_q=tile_q, interpret=False))
        ms_x = pipelined_ms(lambda: fx(table, anchor, w))
        ms_p = pipelined_ms(lambda: fp(table, anchor, w))
        tot["xla"] += ms_x
        tot["pallas"] += ms_p
        print(f"level {h}x{wd}: xla {ms_x:7.1f} ms  pallas {ms_p:7.1f} ms",
              flush=True)

    print(f"TOTAL (all levels, B={batch}): xla {tot['xla']:.1f} ms "
          f"pallas {tot['pallas']:.1f} ms")
    enc_layers = 6
    for k2, v in tot.items():
        per_img = v * enc_layers / batch
        print(f"{k2}: encoder-gather cost {per_img:.1f} ms/img "
              f"-> ceiling {1e3/per_img:.1f} imgs/s (gathers alone)")


if __name__ == "__main__":
    main()
