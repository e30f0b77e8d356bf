"""Dataset download helpers (Zenodo archives).

Equivalent of reference ``neuralop/data/datasets/web_utils.py``: md5-checked
URL downloads and Zenodo record retrieval. In zero-egress environments the
functions raise a clear error pointing at the synthetic generators instead.
"""

import hashlib
import json
import shutil
import urllib.request
from pathlib import Path
from typing import List, Optional


def download_from_url(
    url: str, dest: Path, md5: Optional[str] = None, timeout: int = 60
) -> Path:
    """Download ``url`` to ``dest``, verifying the md5 checksum if given."""
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp, open(
            dest, "wb"
        ) as f:
            shutil.copyfileobj(resp, f)
    except Exception as e:
        raise ConnectionError(
            f"Could not download {url} (offline environment?). "
            "Use the in-package synthetic data generators "
            "(neuraloperator_tpu.data.datasets.synthetic) instead."
        ) from e
    if md5 is not None:
        digest = hashlib.md5(dest.read_bytes()).hexdigest()
        if digest != md5:
            dest.unlink()
            raise ValueError(
                f"md5 mismatch for {url}: expected {md5}, got {digest}"
            )
    return dest


def download_from_zenodo_record(
    record_id: str,
    root: Path,
    files_to_download: Optional[List[str]] = None,
) -> List[Path]:
    """Download (selected) files of a Zenodo record
    (reference web_utils.py:134)."""
    api = f"https://zenodo.org/api/records/{record_id}"
    try:
        with urllib.request.urlopen(api, timeout=60) as resp:
            record = json.load(resp)
    except Exception as e:
        raise ConnectionError(
            f"Could not reach Zenodo record {record_id} (offline "
            "environment?). Use the synthetic generators instead."
        ) from e
    out = []
    for f in record.get("files", []):
        name = f.get("key")
        if files_to_download is not None and name not in files_to_download:
            continue
        url = f["links"]["self"]
        md5 = f.get("checksum", "").replace("md5:", "") or None
        out.append(download_from_url(url, Path(root) / name, md5=md5))
    return out


def calculate_md5(fpath, chunk_size: int = 1024 * 1024) -> str:
    """md5 of a file, streamed (reference web_utils.py md5 helpers)."""
    import hashlib

    md5 = hashlib.md5()
    with open(fpath, "rb") as f:
        for chunk in iter(lambda: f.read(chunk_size), b""):
            md5.update(chunk)
    return md5.hexdigest()


def check_md5(fpath, md5: str) -> bool:
    return md5 == calculate_md5(fpath)


def check_integrity(fpath, md5=None) -> bool:
    import os

    if not os.path.isfile(fpath):
        return False
    if md5 is None:
        return True
    return check_md5(fpath, md5)
