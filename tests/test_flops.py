"""Utilization accounting: XLA-cost-model FLOPs and MFU math."""

import jax
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.utils import compiled_flops, utilization


def test_compiled_flops_counts_matmul():
    f = jax.jit(lambda a, b: a @ b)
    a = jnp.zeros((64, 64))
    flops = compiled_flops(f, a, a)
    assert flops is not None
    # dense matmul: 2·n³ FLOPs, allow cost-model slack
    assert 0.5 * 2 * 64**3 <= flops <= 2 * 2 * 64**3


def test_compiled_flops_accepts_avals():
    f = jax.jit(lambda a: jnp.sin(a).sum())
    aval = jax.ShapeDtypeStruct((128,), jnp.float32)
    assert compiled_flops(f, aval) is not None


def test_utilization_math_and_none_safety():
    out = utilization(1e12, 1.0)
    assert out["achieved_tflops"] == 1.0
    # mfu may be None (CPU test backend has no MXU peak)
    assert utilization(None, 1.0)["achieved_tflops"] is None
    assert utilization(1e12, 0.0)["achieved_tflops"] is None
