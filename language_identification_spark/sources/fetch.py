"""Model-artifact fetch (SURVEY.md §2.1 S7): the reference's
``download_binary_model`` + prefer-big/fallback-tiny load policy
(fasttext_wrapper.py:13-33), re-expressed for a Spark deployment.

In the reference, the model is fetched lazily on import with ``requests``
and loaded from the package directory. On a cluster the fetch happens ONCE
on the driver (never per-executor — a thousand executors hammering a model
CDN is an anti-pattern); the file then rides to executors via
``spark-submit --files`` / ``SparkContext.addFile``, and the per-executor
lazy singleton in ``operators/lid.py`` loads it from local disk.

Stdlib ``urllib`` only (the sandbox has no ``requests``; urllib handles the
same ``http(s)://`` plus ``file://`` for local mirrors and tests). Writes
are atomic (tmp file + ``os.replace``) so a concurrent reader — or a
driver retry after a crash — never sees a partial model, and an optional
sha256 pin turns a corrupted mirror into a loud error instead of a subtly
wrong classifier.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import urllib.request
from pathlib import Path

__all__ = ["fetch_file", "ensure_model"]

_CHUNK = 1 << 20


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with path.open("rb") as f:
        while chunk := f.read(_CHUNK):
            h.update(chunk)
    return h.hexdigest()


def fetch_file(
    url: str,
    dest: str | Path,
    *,
    sha256: str | None = None,
    timeout: float = 60.0,
) -> Path:
    """Download ``url`` to ``dest`` if not already present; return ``dest``.

    Reference semantics (fasttext_wrapper.py:17-21): skip when the file
    exists. Hardened for driver use: atomic rename, optional sha256 pin
    (checked on BOTH the cached and the freshly-fetched file — a cached
    mismatch means a prior partial/corrupt write and is fatal), and no
    partial file left behind on any failure path.
    """
    dest = Path(dest)
    if dest.exists():
        if sha256 is not None and _sha256(dest) != sha256:
            raise ValueError(
                f"cached model {dest} fails sha256 pin; delete it to re-fetch"
            )
        return dest
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_name(dest.name + ".tmp-fetch")
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp, tmp.open(
            "wb"
        ) as out:
            shutil.copyfileobj(resp, out, _CHUNK)
        if sha256 is not None and (got := _sha256(tmp)) != sha256:
            raise ValueError(
                f"fetched {url}: sha256 {got} != pinned {sha256}"
            )
        os.replace(tmp, dest)  # atomic: readers see nothing or everything
    finally:
        tmp.unlink(missing_ok=True)
    return dest


def ensure_model(
    big_path: str | Path,
    *,
    url: str | None = None,
    tiny_path: str | Path | None = None,
    sha256: str | None = None,
) -> Path:
    """Resolve the model file to load, with the reference's policy
    (fasttext_wrapper.py:24-33): prefer the big model — fetching it when a
    ``url`` is given and it is absent — and fall back to the tiny bundled
    model only when the big one cannot be had. Raises if neither resolves
    (the reference ``assert``s the tiny model exists)."""
    big_path = Path(big_path)
    if big_path.exists():
        return fetch_file("", big_path, sha256=sha256)  # cache-hit + pin check
    if url is not None:
        try:
            return fetch_file(url, big_path, sha256=sha256)
        except OSError:
            # unavailability (network/disk) is the reference's fallback
            # case; an integrity failure (ValueError from the sha256 pin)
            # stays FATAL even with a tiny fallback — silently running the
            # low-quality model on a corrupted mirror is exactly what the
            # pin exists to prevent
            if tiny_path is None:
                raise
    if tiny_path is not None and Path(tiny_path).exists():
        return Path(tiny_path)
    raise FileNotFoundError(
        f"no model: {big_path} absent, no fetchable url, no tiny fallback"
    )
