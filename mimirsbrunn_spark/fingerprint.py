"""The ONE stat-fingerprint scheme shared by every cache/checkpoint key.

Both the stage-checkpoint fingerprint (plans/checkpoint.py) and the IVF
codebook cache key (operators/similarity.py) key on what their input
FILES are — (name, size, mtime_ns) per file, no data read — so a
same-size rewrite invalidates via mtime. Keeping the hashing scheme in
one place means a future tweak (ctime, content sampling, …) cannot land
in one consumer and not the other, silently giving the codebook cache
and the stage checkpoints divergent invalidation semantics.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterable, Tuple


def stat_fingerprint(files: Iterable[Tuple[str, os.stat_result]], salt: str = "") -> str:
    """sha256 hex digest over ``salt`` + (name, size, mtime_ns) triples.

    ``files`` must already be in a deterministic order — callers sort,
    because what counts as the stable name (basename vs dir-relative
    path) is a caller decision.
    """
    h = hashlib.sha256()
    h.update(salt.encode())
    for name, st in files:
        h.update(f"{name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()
