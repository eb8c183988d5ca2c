"""Isolate WHERE the pallas attention time goes: the kernel itself, or the
XLA-side reshape/transpose copies feeding it.

Times, on operands ALREADY in kernel layout ((BH, L, D) / (BH, D, L), no
reshape or transpose in the jitted function):
  pure_kt      the kt grouped kernel alone
  pure_einsum  the same math as one XLA einsum on (BH, L, D) operands
and then the same two including the (B,H,L,D)->(BH,L,D) reshape +
(BH,L,D)->(BH,D,L) transpose, to price the relayout.
"""

import sys

sys.path.insert(0, ".")

from bench import _enable_compile_cache, pipelined_ms

_enable_compile_cache()

import jax
import jax.numpy as jnp

from scripts.diag_attn3 import attn_kt

B, H, L, D = 32, 16, 257, 88
BH = B * H


def main():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q2 = jax.random.normal(k1, (BH, L, D), jnp.bfloat16)
    kt2 = jax.random.normal(k2, (BH, D, L), jnp.bfloat16)
    v2 = jax.random.normal(k3, (BH, L, D), jnp.bfloat16)
    q4 = q2.reshape(B, H, L, D)
    k4 = kt2.swapaxes(1, 2).reshape(B, H, L, D)
    v4 = v2.reshape(B, H, L, D)

    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from scripts.diag_attn3 import _kt_kernel

    def pure_kernel(qp, ktp, vp, group=16):
        spec_ld = pl.BlockSpec((group, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_dl = pl.BlockSpec((group, D, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_kt_kernel, scale=1.0 / D ** 0.5, recip=True,
                              pexp16=False, bdot=False),
            out_shape=jax.ShapeDtypeStruct((BH, L, D), qp.dtype),
            grid=(BH // group,),
            in_specs=[spec_ld, spec_dl, spec_ld],
            out_specs=spec_ld,
        )(qp, ktp, vp)

    @jax.jit
    def pure_kt(qp, ktp, vp):
        return pure_kernel(qp, ktp, vp)

    @jax.jit
    def pure_einsum(qp, ktp, vp):
        logits = jnp.einsum("gld,gdm->glm", qp, ktp)
        p = jnp.exp(jnp.clip(logits.astype(jnp.float32) / D ** 0.5, -60, 60))
        s = jnp.sum(p, -1, keepdims=True)
        o = jnp.einsum("glm,gmd->gld", p.astype(vp.dtype), vp)
        return (o / s).astype(qp.dtype)

    @jax.jit
    def reshaped_kt(q, k, v):
        return attn_kt(q, k, v, group=16, recip=True)

    for name, fn, args in [
        ("pure_kt", pure_kt, (q2, kt2, v2)),
        ("pure_einsum", pure_einsum, (q2, kt2, v2)),
        ("reshaped_kt", reshaped_kt, (q4, k4, v4)),
    ]:
        ms = pipelined_ms(lambda fn=fn, args=args: fn(*args))
        print(f"{name:12s}: {ms:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
