"""File IO helpers: download-once cache with file locking.

Capability analogue of /root/reference/basedet/utils/file_io.py:31-99
(cache_s3 / get_cache_dir with portalocker): remote checkpoint/dataset
artifacts are fetched once into a shared cache guarded by a lock so
concurrent hosts don't duplicate work. S3/megfile is replaced by generic
URL/path handling (fsspec-style backends can register via COPY_HANDLERS).
"""
from __future__ import annotations

import os
import shutil
import urllib.request
from typing import Callable, Dict

import portalocker

COPY_HANDLERS: Dict[str, Callable[[str, str], None]] = {}


def get_cache_dir(*paths: str) -> str:
    root = os.environ.get(
        "BASEDET_CACHE_DIR", os.path.expanduser("~/.cache/basedet_tpu")
    )
    path = os.path.join(root, *paths)
    os.makedirs(path, exist_ok=True)
    return path


def _copy(src: str, dst: str) -> None:
    for prefix, handler in COPY_HANDLERS.items():
        if src.startswith(prefix):
            handler(src, dst)
            return
    if src.startswith(("http://", "https://")):
        urllib.request.urlretrieve(src, dst)
    else:
        shutil.copyfile(src, dst)


def cache_file(uri: str) -> str:
    """Fetch ``uri`` into the cache exactly once (lock-guarded); returns the
    local path. Local paths pass through untouched."""
    if os.path.exists(uri):
        return uri
    name = uri.rstrip("/").split("/")[-1]
    cache_dir = get_cache_dir("files")
    local = os.path.join(cache_dir, name)
    lock = local + ".lock"
    with portalocker.Lock(lock, timeout=600):
        if not os.path.exists(local):
            tmp = local + ".tmp"
            _copy(uri, tmp)
            os.replace(tmp, local)
    return local
