"""Driver-side HTTP fetch to a staging path.

The reference curls the GENCODE GTF (``workflows/cnv.py:319-347``). Network
ingress is not a Spark operator — the idiomatic shape is: fetch once on the
driver to a staging location Spark can scan (local path, S3), then
``spark.read`` it. Gzip is left compressed; Spark's codecs read .gz
transparently.
"""

from __future__ import annotations

import os


def fetch_to_staging(url: str, dest_path: str, timeout_s: float = 60.0) -> str:
    try:
        import requests
    except ImportError as exc:
        raise NotImplementedError(
            "HTTP staging fetch requires the requests package; place the "
            "file at the staging path manually instead"
        ) from exc
    os.makedirs(os.path.dirname(os.path.abspath(dest_path)), exist_ok=True)
    with requests.get(url, stream=True, timeout=timeout_s) as r:
        r.raise_for_status()
        with open(dest_path, "wb") as f:
            for chunk in r.iter_content(chunk_size=1 << 20):
                f.write(chunk)
    return dest_path
