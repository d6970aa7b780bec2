"""On-disk AOT executable cache — a persistent compile cache that works on
the axon TPU backend.

JAX's own persistent compilation cache (enabled at package import for the
CPU backend) does NOT persist across processes on the axon TPU plugin: the
backend recompiles identical programs in fresh processes (verified twice,
CLAUDE.md), and first compiles through the TPU tunnel measured 72-930 s for
the *same* program (RESULTS.md, Wall-clock). That variance killed the
round-4 driver benchmark (BENCH_r04 rc=124: the budget died inside one
compile).

This module caches at a lower level: the *compiled executable* itself,
serialized with ``jax.experimental.serialize_executable`` and keyed by
``(jax version, device kind, sha256 of the lowered StableHLO)``. Any change
to the traced program — code, shapes, dtypes, static args, sharding —
changes the lowered text and therefore misses the cache; a hit skips XLA
entirely and deserializes in ~seconds.

Two-phase API (``lower_and_check`` → ``load_or_compile``) so callers can
branch on hit/miss BEFORE paying for anything else (bench.py skips building
its staged fallback configuration entirely when the final executable is
cached); ``cached_compile`` is the one-call convenience wrapper.

Scope and caveats:
- The returned object is an AOT ``Compiled``: call it with the DYNAMIC
  arguments only (static args were baked in at lowering). Donation and
  input shardings are preserved in the executable.
- Executables are device-kind-specific; the key includes
  ``device.device_kind`` so CPU and TPU entries never collide.
- Deserialization of a stale/foreign blob can fail — every cache read is
  wrapped; ``load_or_compile`` falls back to ``lowered.compile()``.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "mivit_aot"
)


def _cache_enabled() -> bool:
    return os.environ.get("MIVIT_AOT_CACHE", "1") != "0"


def _key_for(lowered) -> str:
    dev = jax.devices()[0]
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(dev.device_kind.encode())
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:32]


def lower_and_check(
    jitted: Callable,
    *args: Any,
    tag: str = "fn",
    cache_dir: Optional[str] = None,
    log: Optional[Callable[[str], None]] = None,
    **kwargs: Any,
) -> Tuple[Any, Dict[str, Any]]:
    """Lower ``jitted`` on ``args``/``kwargs``; return ``(lowered, entry)``
    where ``entry["hit"]`` says whether a cached executable exists for this
    exact program on this device kind. Costs one trace + lowering, no XLA
    compilation and no cache read."""
    say = log or (lambda m: None)
    t0 = time.perf_counter()
    lowered = jitted.lower(*args, **kwargs)
    lower_s = time.perf_counter() - t0
    entry: Dict[str, Any] = {
        "tag": tag, "lower_s": round(lower_s, 2), "hit": False, "path": None
    }
    if _cache_enabled():
        key = _key_for(lowered)
        cdir = cache_dir or os.environ.get("MIVIT_AOT_CACHE_DIR") or DEFAULT_CACHE_DIR
        entry["key"] = key
        entry["path"] = os.path.join(cdir, f"{tag}-{key}.aot")
        entry["hit"] = os.path.exists(entry["path"])
    say(
        f"[aot] {tag}: lowered in {lower_s:.1f}s, cache "
        f"{'HIT' if entry['hit'] else 'MISS'}"
    )
    return lowered, entry


def load_or_compile(
    lowered,
    entry: Dict[str, Any],
    log: Optional[Callable[[str], None]] = None,
):
    """Deserialize the cached executable for ``entry`` (from
    ``lower_and_check``), or compile and persist it. Returns the AOT
    ``Compiled``; ``entry`` gains ``source``/timing fields."""
    say = log or (lambda m: None)
    tag = entry["tag"]
    if entry.get("hit") and entry.get("path"):
        try:
            t0 = time.perf_counter()
            with open(entry["path"], "rb") as f:
                payload = pickle.load(f)
            compiled = _deserialize(payload)
            entry.update(source="cache", load_s=round(time.perf_counter() - t0, 2))
            say(f"[aot] {tag}: deserialized in {entry['load_s']}s")
            return compiled
        except Exception as e:  # stale/foreign blob — recompile
            say(f"[aot] {tag}: cache entry unusable ({type(e).__name__}: {e})")

    say(f"[aot] {tag}: compiling (XLA)...")
    t0 = time.perf_counter()
    compiled = lowered.compile()
    entry.update(source="compile", compile_s=round(time.perf_counter() - t0, 2))
    say(f"[aot] {tag}: compiled in {entry['compile_s']}s")

    if entry.get("path"):
        try:
            from jax.experimental.serialize_executable import serialize

            os.makedirs(os.path.dirname(entry["path"]), exist_ok=True)
            payload = serialize(compiled)
            # record the executable's device assignment: deserialize_and_load
            # defaults to ALL backend devices, which breaks single-device
            # executables on hosts with a forced virtual device count
            try:
                n_devs = len(compiled._executable.xla_executable.local_devices())
            except Exception:
                n_devs = 1
            tmp = f"{entry['path']}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump({"payload": payload, "n_devices": n_devs}, f)
            os.replace(tmp, entry["path"])
            say(f"[aot] {tag}: serialized to {entry['path']}")
        except Exception as e:  # serialization unsupported on this backend
            entry["serialize_error"] = f"{type(e).__name__}: {e}"
            say(f"[aot] {tag}: executable not serializable ({entry['serialize_error']})")
    return compiled


def cached_compile(
    jitted: Callable,
    *args: Any,
    tag: str = "fn",
    cache_dir: Optional[str] = None,
    log: Optional[Callable[[str], None]] = None,
    **kwargs: Any,
) -> Tuple[Callable, Dict[str, Any]]:
    """One-call wrapper: ``lower_and_check`` + ``load_or_compile``.

    ``compiled`` is an AOT executable: call it with the dynamic arguments
    only (in the lowered order), NOT the static ones. ``info`` reports
    ``source`` ("cache"|"compile"), ``key``, ``path`` and phase timings.
    Set ``MIVIT_AOT_CACHE=0`` to bypass reads and writes."""
    lowered, entry = lower_and_check(
        jitted, *args, tag=tag, cache_dir=cache_dir, log=log, **kwargs
    )
    compiled = load_or_compile(lowered, entry, log=log)
    return compiled, entry


def _deserialize(entry):
    from jax.experimental.serialize_executable import deserialize_and_load

    if isinstance(entry, dict):  # current format: payload + device count
        serialized, in_tree, out_tree = entry["payload"]
        devices = jax.devices()[: entry["n_devices"]]
        return deserialize_and_load(
            serialized, in_tree, out_tree, execution_devices=devices
        )
    return deserialize_and_load(*entry)
