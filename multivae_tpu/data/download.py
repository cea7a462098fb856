"""Archive download + extraction for the bundled datasets.

The reference auto-downloads PolyMNIST from zenodo
(``src/multivae/data/datasets/mmnist.py:142``), CUB from the authors'
mirror (``cub.py:357``) and MHD from Google Drive via gdown
(``mhd.py:150-156``). The equivalents here use stdlib urllib + zipfile so
no extra dependency is needed (gdown stays optional for the Drive-hosted
MHD files).
"""

from __future__ import annotations

import logging
import os
import tarfile
import zipfile

logger = logging.getLogger(__name__)

DATASET_URLS = {
    "PolyMNIST": "https://zenodo.org/record/4899160/files/PolyMNIST.zip",
    "CUB": "http://www.robots.ox.ac.uk/~yshi/mmdgm/datasets/cub.zip",
}


def extract_archive(archive_path: str, dest_dir: str):
    """Extract a .zip / .tar(.gz) archive into dest_dir."""
    if zipfile.is_zipfile(archive_path):
        with zipfile.ZipFile(archive_path) as zf:
            zf.extractall(dest_dir)
        return
    if tarfile.is_tarfile(archive_path):
        with tarfile.open(archive_path) as tf:
            # filter="data" rejects path traversal / special members (the CUB
            # mirror is plain http, so the archive is untrusted in transit).
            tf.extractall(dest_dir, filter="data")
        return
    raise ValueError(f"Unsupported archive format: {archive_path}")


def sha256_of(path: str, chunk: int = 1 << 20) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            block = f.read(chunk)
            if not block:
                break
            h.update(block)
    return h.hexdigest()


def fetch_and_extract(url: str, dest_dir: str, archive_name: str = None,
                      keep_archive: bool = False,
                      sha256: str = None) -> str:
    """Download an archive to dest_dir and extract it there.

    Returns dest_dir. Raises URLError/HTTPError on network failure with the
    manual-download URL in the message. Pass ``sha256`` to verify the
    archive before extraction (recommended for the plain-http CUB mirror);
    a mismatching file is deleted and the error names both digests.
    """
    import urllib.request

    os.makedirs(dest_dir, exist_ok=True)
    archive_name = archive_name or os.path.basename(url.split("?")[0])
    archive_path = os.path.join(dest_dir, archive_name)
    if not os.path.exists(archive_path):
        logger.info("Downloading %s -> %s", url, archive_path)
        try:
            urllib.request.urlretrieve(url, archive_path)
        except Exception as e:  # noqa: BLE001 - surface the manual fallback
            raise RuntimeError(
                f"Download failed ({e}). Download manually from {url} and "
                f"extract into {dest_dir}."
            ) from e
    if sha256 is not None:
        digest = sha256_of(archive_path)
        if digest != sha256.lower():
            os.remove(archive_path)
            raise RuntimeError(
                f"Checksum mismatch for {archive_path}: expected {sha256}, "
                f"got {digest}. The corrupt file was deleted; retry the "
                "download."
            )
    logger.info("Extracting %s", archive_path)
    extract_archive(archive_path, dest_dir)
    if not keep_archive:
        os.remove(archive_path)
    return dest_dir


def maybe_download_mmnist(data_path: str):
    """Fetch PolyMNIST (zenodo) into ``data_path`` (creates MMNIST/...)."""
    return fetch_and_extract(DATASET_URLS["PolyMNIST"], data_path,
                             archive_name="PolyMNIST.zip")


def maybe_download_cub(data_path: str):
    """Fetch CUB images+captions into ``data_path`` (creates cub/...)."""
    return fetch_and_extract(DATASET_URLS["CUB"], data_path,
                             archive_name="cub.zip")
