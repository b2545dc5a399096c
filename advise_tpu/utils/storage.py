"""Remote/object-storage IO behind the reference's smart_open surface.

Reference: ``utils/misc.py:311-317`` + ``datasets/video_dataset.py:30-34``
read videos and checkpoints through ``megfile.smart_open`` (s3://...).
Here the backend is fsspec, so any installed protocol works uniformly
(gs://, s3://, memory:// for tests); local paths bypass fsspec entirely.

Two deliberate TPU-side differences:

- cv2 cannot decode from a stream, so remote videos are fetched into a
  local cache file first (``fetch_local``) — decode itself stays local.
- checkpoints are Orbax *directories*, not single torch files, so remote
  checkpointing is a recursive dir mirror (``put_dir``/``get_dir``)
  driven by ``TRAIN.CHECKPOINT_REMOTE`` rather than a streamed
  ``torch.save``.
"""

from __future__ import annotations

import logging
import os
import posixpath
import tempfile
from typing import List, Optional

logger = logging.getLogger(__name__)


def is_remote(path) -> bool:
    p = str(path)
    return "://" in p and not p.startswith("file://")


def _fs(path):
    import fsspec

    return fsspec.core.url_to_fs(str(path))  # (fs, stripped_path)


def smart_open(path, mode: str = "rb"):
    """File handle for a local path or any fsspec URL (reference
    utils/misc.py:311-317 smart_open call sites)."""
    if not is_remote(path):
        return open(path, mode)
    import fsspec

    return fsspec.open(str(path), mode).open()


def smart_exists(path) -> bool:
    if not is_remote(path):
        return os.path.exists(path)
    fs, p = _fs(path)
    return fs.exists(p)


def smart_listdir(path) -> List[str]:
    if not is_remote(path):
        return os.listdir(path)
    fs, p = _fs(path)
    return [posixpath.basename(e.rstrip("/")) for e in fs.ls(p, detail=False)]


def fetch_local(path, cache_dir: Optional[str] = None) -> str:
    """Return a local filesystem path for ``path``, downloading through
    fsspec into a cache file when remote (cv2 decode needs a real file)."""
    if not is_remote(path):
        return str(path)
    fs, p = _fs(path)
    cache_dir = cache_dir or os.path.join(
        tempfile.gettempdir(), "advise_tpu_media_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    # stable cache name: hash of the URL + original extension
    import hashlib

    ext = os.path.splitext(p)[1]
    local = os.path.join(
        cache_dir, hashlib.sha1(str(path).encode()).hexdigest() + ext
    )
    if not os.path.exists(local):
        fs.get_file(p, local)
    return local


def put_dir(local_dir: str, remote_dir) -> None:
    """Recursively mirror a local directory to a remote URL."""
    fs, p = _fs(remote_dir)
    fs.put(local_dir, p, recursive=True)


def get_dir(remote_dir, local_dir: str) -> None:
    """Recursively fetch a remote directory URL into a local directory."""
    fs, p = _fs(remote_dir)
    os.makedirs(local_dir, exist_ok=True)
    # fsspec get(recursive) replicates the tree under local_dir
    fs.get(p.rstrip("/") + "/", local_dir.rstrip("/") + "/", recursive=True)


def join(base, *parts) -> str:
    if is_remote(base):
        return posixpath.join(str(base), *parts)
    return os.path.join(str(base), *parts)
