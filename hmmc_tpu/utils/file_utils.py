"""Resource resolution (reference: modules/file_utils.py — the
AllenNLP-derived cached_path machinery used by its config loader).

This build is local-first: configs and checkpoints resolve from disk.
URL/S3 fetching is supported when the environment has egress (gated import
of requests/boto3), caching into ``HMMC_TPU_CACHE``
(~/.cache/hmmc_tpu by default) keyed by URL hash — the same contract as the
reference's ``cached_path`` (file_utils.py) without being a hard
dependency.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from typing import Optional
from urllib.parse import urlparse

CACHE_DIR = os.environ.get(
    "HMMC_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                   "hmmc_tpu"))


def url_to_filename(url: str, etag: Optional[str] = None) -> str:
    name = hashlib.sha256(url.encode()).hexdigest()
    if etag:
        name += "." + hashlib.sha256(etag.encode()).hexdigest()
    return name


def cached_path(url_or_filename: str,
                cache_dir: Optional[str] = None) -> str:
    """Local path -> returned as-is (must exist); http(s)/s3 URL ->
    download-once into the cache and return the cached file path."""
    parsed = urlparse(url_or_filename)
    if parsed.scheme in ("http", "https"):
        return _get_from_http(url_or_filename, cache_dir or CACHE_DIR)
    if parsed.scheme == "s3":
        return _get_from_s3(url_or_filename, cache_dir or CACHE_DIR)
    if os.path.exists(url_or_filename):
        return url_or_filename
    if parsed.scheme == "":
        raise FileNotFoundError(f"file {url_or_filename} not found")
    raise ValueError(f"unable to parse {url_or_filename!r} as URL or path")


def _get_from_http(url: str, cache_dir: str) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, url_to_filename(url))
    if os.path.exists(path):
        return path
    import requests  # gated: zero-egress envs never reach here with a hit

    with tempfile.NamedTemporaryFile(delete=False) as tmp:
        r = requests.get(url, stream=True, timeout=60)
        r.raise_for_status()
        for chunk in r.iter_content(chunk_size=1 << 20):
            tmp.write(chunk)
    shutil.move(tmp.name, path)
    with open(path + ".json", "w", encoding="utf-8") as f:
        json.dump({"url": url}, f)
    return path


def _get_from_s3(url: str, cache_dir: str) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, url_to_filename(url))
    if os.path.exists(path):
        return path
    import boto3  # gated optional dependency

    parsed = urlparse(url)
    bucket, key = parsed.netloc, parsed.path.lstrip("/")
    boto3.resource("s3").Bucket(bucket).download_file(key, path)
    return path
