"""Persistent XLA compile cache, keyed per backend + machine.

The 256³ cascade programs compile in ~9-12 min cold and in seconds when
cached; without this every `hvc train`/probe run re-pays the full compile.
Keying by backend keeps CPU (test/dryrun) artifacts from poisoning the TPU
cache, and the machine tag keeps XLA:CPU AOT entries (which bake the compile
host's CPU features) from crossing hosts — round-2/3 logs showed
cpu_aot_loader machine-feature-mismatch warnings threatening SIGILL.
bench.py and __graft_entry__.py carry a local copy of the same scheme (their
orchestrators must not import the package before choosing a platform).
"""

from __future__ import annotations

import hashlib
import os

DEFAULT_ROOT = "/root/jaxcache"


def setup_compile_cache(root: str | None = None) -> str:
    """Point jax_compilation_cache_dir at <root>/<backend>-<cpu-flags-hash>.
    Initializes the backend (jax.default_backend) as a side effect; call
    after the platform is pinned but before the first compilation. Returns
    the cache dir. Opt out with HVC_NO_COMPILE_CACHE=1."""
    import jax

    if os.environ.get("HVC_NO_COMPILE_CACHE"):
        return ""
    root = root or os.environ.get("HVC_COMPILE_CACHE", DEFAULT_ROOT)
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    tag = hashlib.sha1(flags.encode()).hexdigest()[:8]
    cache_dir = os.path.join(root, f"{jax.default_backend()}-{tag}")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception as e:  # cache is best-effort; never block training
        print(f"[cache] compile cache disabled: {e}")
        return ""
    return cache_dir
