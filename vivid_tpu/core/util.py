"""Foundation utilities (dnnlib.util parity surface).

open_url (dnnlib/util.py:374-494): the reference's cached HTTP downloader is
how it fetches model pickles and detector weights. This environment has no
egress, so the cache contract is preserved — a URL whose payload already
exists in the cache dir resolves to it; local paths and file:// pass through;
a cold HTTP fetch raises a clear error instructing how to pre-seed the cache.
"""

import hashlib
import io
import os
import re
import urllib.parse
from typing import Optional

_cache_dir: Optional[str] = None


def set_cache_dir(path: str):
    global _cache_dir
    _cache_dir = path


def make_cache_dir_path(*paths) -> str:
    base = _cache_dir or os.environ.get(
        "VIVID_CACHE_DIR", os.path.expanduser("~/.cache/vivid_tpu"))
    path = os.path.join(base, *paths)
    os.makedirs(path, exist_ok=True)
    return path


def enable_persistent_compilation_cache():
    """Point JAX's persistent compilation cache at a stable directory so
    fresh CLI processes reuse compiled executables (cold train-step/sampler
    compiles take minutes on remote-compile TPU backends; warm loads take
    seconds — see tools/prime_cache.py to pre-seed). Override the location
    with VIVID_COMP_CACHE, disable with VIVID_COMP_CACHE=0. Safe to call
    after backends are initialized; errors are non-fatal."""
    loc = os.environ.get("VIVID_COMP_CACHE")
    if loc == "0":
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          loc or os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def is_url(obj, allow_file_urls: bool = False) -> bool:
    if not isinstance(obj, str) or "://" not in obj:
        return False
    if allow_file_urls and obj.startswith("file://"):
        return True
    try:
        res = urllib.parse.urlparse(obj)
        return bool(res.scheme in ("http", "https") and res.netloc)
    except Exception:
        return False


def open_url(url: str, cache_dir: Optional[str] = None, cache: bool = True,
             verbose: bool = True, return_filename: bool = False):
    """Open a local path, file:// URL, or cache-resident HTTP URL.

    HTTP URLs resolve against <cache_dir>/downloads/<md5>_<name>; a cache miss
    raises (no egress) with the exact path to pre-seed.
    """
    if url.startswith("file://"):
        url = urllib.parse.urlparse(url).path
    if not is_url(url):
        if return_filename:
            return url
        return open(url, "rb")

    cache_root = cache_dir or make_cache_dir_path("downloads")
    url_md5 = hashlib.md5(url.encode("utf-8")).hexdigest()
    safe_name = re.sub(r"[^0-9a-zA-Z\-._]", "_", url.split("/")[-1]) or "download"
    path = os.path.join(cache_root, f"{url_md5}_{safe_name}")
    if cache and os.path.exists(path):
        if verbose:
            print(f"Using cached {path}")
        return path if return_filename else open(path, "rb")
    # Also accept a bare-name pre-seed (user dropped the file in by name).
    bare = os.path.join(cache_root, safe_name)
    if os.path.exists(bare):
        return bare if return_filename else open(bare, "rb")
    raise FileNotFoundError(
        f"No network egress available to fetch {url!r}. Pre-seed the cache by "
        f"placing the file at {path} (or {bare}).")
