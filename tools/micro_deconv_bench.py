#!/usr/bin/env python
"""Micro-bench: is the 5x5 stride-2 stem/deconv a padded-lane problem?

The image-side convs move between 3 and 160 channels; the 3-channel side
pads to 128 MXU lanes (2.3% useful), and `lax.conv_transpose` additionally
works at the 32x32 OUTPUT resolution, so its padded MAC count rivals a
full 160-channel trunk conv (tools/roofline.py tile_ceiling rows "stem"/
"deconv"). If XLA's lowering really pays that cost, the fix is the
standard sub-pixel trick: a 16x16-resolution conv to 4*channels followed
by depth-to-space. This harness times (fwd + bwd, interleaved best-of-N,
value-fetch — see tools/ab_bench.py for why) four jitted programs:

  tconv    conv_transpose 5x5 /2, 160->3, in 16x16 out 32x32  (production)
  subpix   conv 3x3 160->12 at 16x16 + depth_to_space         (challenger*)
  stem     conv 5x5 stride 2, 3->160, in 32x32                (production)
  trunk    conv 3x3 160->384 at 16x16                         (scale ref)

*same output shape/cost class, not the exact transposed-conv math — this
is a TIMING probe deciding whether an exact sub-pixel deconv2d is worth
implementing, not a correctness twin.

Usage: python tools/micro_deconv_bench.py [rounds] [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    B = 32
    dn = ("NHWC", "HWIO", "NHWC")
    key = jax.random.PRNGKey(0)
    cases = {}

    def make(name, x, w, op):
        def loss(x, w):
            return jnp.sum(op(x.astype(jnp.bfloat16),
                              w.astype(jnp.bfloat16)).astype(jnp.float32))

        def body(carry, _):
            x, w = carry
            l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
            # fold grads back in so iterations can't be CSE'd/DCE'd
            return (x + 1e-30 * gx, w + 1e-30 * gw), l

        @jax.jit
        def run(x, w):
            (_, _), ls = jax.lax.scan(body, (x, w), None, length=iters)
            return ls[-1]

        cases[name] = (run, x, w)

    k1, k2, k3, k4 = jax.random.split(key, 4)
    x16 = jax.random.normal(k1, (B, 16, 16, 160), jnp.float32)
    x32 = jax.random.normal(k2, (B, 32, 32, 3), jnp.float32)

    make("tconv", x16, jax.random.normal(k3, (5, 5, 160, 3)) * 0.05,
         lambda x, w: jax.lax.conv_transpose(
             x, w, strides=(2, 2), padding="SAME", dimension_numbers=dn))

    def subpix(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn)  # [B,16,16,12]
        b, h, ww, _ = y.shape
        y = y.reshape(b, h, ww, 2, 2, 3)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * ww, 3)

    make("subpix", x16, jax.random.normal(k3, (3, 3, 160, 12)) * 0.05,
         subpix)

    make("stem", x32, jax.random.normal(k4, (5, 5, 3, 160)) * 0.05,
         lambda x, w: jax.lax.conv_general_dilated(
             x, w, (2, 2), "SAME", dimension_numbers=dn))

    make("trunk", x16, jax.random.normal(k4, (3, 3, 160, 384)) * 0.05,
         lambda x, w: jax.lax.conv_general_dilated(
             x, w, (1, 1), "SAME", dimension_numbers=dn))

    for name, (run, x, w) in cases.items():
        t0 = time.time()
        _ = float(np.asarray(run(x, w)))
        print(f"[micro] {name}: compile+warm {time.time() - t0:.1f}s",
              file=sys.stderr)

    best: dict[str, float] = {}
    for r in range(rounds):
        for name, (run, x, w) in cases.items():
            t0 = time.time()
            _ = float(np.asarray(run(x, w)))
            us = (time.time() - t0) / iters * 1e6
            best[name] = min(best.get(name, float("inf")), us)
            print(f"[micro] r{r} {name}: {us:.1f} us/iter "
                  f"(best {best[name]:.1f})", file=sys.stderr)
    print({k: round(v, 1) for k, v in best.items()})


if __name__ == "__main__":
    main()
