"""tools/scaling_model.py — HLO allreduce-traffic extraction + ring model.

The end-to-end run (lowering the SPMD step at mesh {1,8,16} and printing
the prediction JSON) is exercised by the committed artifact
(artifacts/scaling_model_r4.json); these tests pin the two pure pieces.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from scaling_model import allreduce_bytes, ring_ms  # noqa: E402


def test_allreduce_bytes_counts_tuple_and_scalar_shapes():
    hlo = """
  %x = f32[100,10]{1,0} add(f32[100,10] %a, f32[100,10] %b)
  %ar0 = f32[1000]{0} all-reduce(f32[1000] %g), replica_groups={}
  %ar1 = (f32[50,2]{1,0}, bf16[10]{0}) all-reduce(f32[50,2] %p, bf16[10] %q)
  %ar-start = f32[8]{0} all-reduce-start(f32[8] %z)
"""
    total, count = allreduce_bytes(hlo)
    # 1000*4 + (100*4 + 10*2) + 8*4 = 4000 + 420 + 32
    assert count == 3
    assert total == 4000 + 420 + 32


def test_allreduce_bytes_ignores_other_collectives_and_compute():
    hlo = """
  %ag = f32[64]{0} all-gather(f32[8] %x)
  %conv = f32[4,4]{1,0} convolution(f32[4,4] %a, f32[4,4] %b)
"""
    total, count = allreduce_bytes(hlo)
    assert (total, count) == (0, 0)


def test_ring_model_scaling_shape():
    # 2(n-1)/n scaling: n=2 moves 1x bytes, n->inf approaches 2x
    b = 100e9  # 100 GB at 100 GB/s
    assert abs(ring_ms(b, 2, 100.0) - 1000.0) < 1e-6
    assert ring_ms(b, 8, 100.0) > ring_ms(b, 2, 100.0)
    assert ring_ms(b, 10**6, 100.0) < 2000.0
    assert ring_ms(0, 8, 100.0) == 0.0
    assert ring_ms(b, 1, 100.0) == 0.0  # single device: no collective
