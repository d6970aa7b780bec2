"""utils.aot_cache: the persistent AOT-executable compile cache that makes
the driver benchmark robust to the axon backend's 72-930 s tunnel-compile
variance (RESULTS.md Wall-clock; BENCH_r04 rc=124)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.utils.aot_cache import cached_compile


def _jitted(scale):
    def f(state, x, n: int):
        return state + scale * x * n, (state * x).sum()

    return jax.jit(f, static_argnames=("n",), donate_argnums=(0,))


def test_miss_then_hit_roundtrip(tmp_path):
    cache_dir = str(tmp_path)
    s = jnp.ones((8,))
    x = jnp.arange(8.0)

    compiled, info = cached_compile(_jitted(1.0), s, x, 3, tag="t", cache_dir=cache_dir)
    assert info["source"] == "compile"
    expect = np.asarray(compiled(jnp.ones((8,)), x)[0])

    # same program again: served from disk, bitwise-identical results
    compiled2, info2 = cached_compile(_jitted(1.0), s, x, 3, tag="t", cache_dir=cache_dir)
    assert info2["source"] == "cache" and info2["key"] == info["key"]
    got = np.asarray(compiled2(jnp.ones((8,)), x)[0])
    np.testing.assert_array_equal(got, expect)

    # donation is preserved through serialization: the executable aliases
    # its first argument, so the donated buffer is consumed
    donated = jnp.ones((8,))
    compiled2(donated, x)
    assert donated.is_deleted()


def test_program_change_invalidates(tmp_path):
    cache_dir = str(tmp_path)
    s, x = jnp.ones((8,)), jnp.arange(8.0)
    _, i1 = cached_compile(_jitted(1.0), s, x, 3, tag="t", cache_dir=cache_dir)
    # different constant → different lowered HLO → different key
    _, i2 = cached_compile(_jitted(2.0), s, x, 3, tag="t", cache_dir=cache_dir)
    assert i2["source"] == "compile" and i2["key"] != i1["key"]
    # different static arg → also a different program
    _, i3 = cached_compile(_jitted(1.0), s, x, 4, tag="t", cache_dir=cache_dir)
    assert i3["source"] == "compile" and i3["key"] != i1["key"]


def test_env_var_disables(tmp_path, monkeypatch):
    monkeypatch.setenv("MIVIT_AOT_CACHE", "0")
    s, x = jnp.ones((8,)), jnp.arange(8.0)
    _, info = cached_compile(_jitted(1.0), s, x, 3, tag="t", cache_dir=str(tmp_path))
    assert info["source"] == "compile"
    assert not os.listdir(tmp_path)


def test_corrupt_entry_falls_back(tmp_path):
    cache_dir = str(tmp_path)
    s, x = jnp.ones((8,)), jnp.arange(8.0)
    _, info = cached_compile(_jitted(1.0), s, x, 3, tag="t", cache_dir=cache_dir)
    with open(info["path"], "wb") as f:
        f.write(b"not a pickle")
    compiled, info2 = cached_compile(_jitted(1.0), s, x, 3, tag="t", cache_dir=cache_dir)
    assert info2["source"] == "compile"
    assert float(compiled(jnp.ones((8,)), x)[1]) == float((jnp.ones((8,)) * x).sum())
