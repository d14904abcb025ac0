"""Shared fold-horizon bookkeeping for the batch-log stores (r12).

Three stores — the index log (``streaming/index_stream``), the BM25
postings store (``operators/lexical_store``), and the LSH signature
store (``operators/ann``) — keep a ``batch=<id>`` maintenance log and
periodically FOLD it into a base generation.  A fold keeps only each
doc's latest row, so batch-bounded reads (the consistent-read
``up_to_batch=`` surface) are exact only back to the highest folded
batch: the HORIZON.  Each store persists it in a tiny sidecar file next
to its generation manifest; this module is the single definition of the
read/stamp protocol so the crash-window rule stays stated once:

**Stamp BEFORE the generation manifest publishes.**  A crash between
the two leaves a too-high horizon over an unfolded store — bounded
reads below it raise needlessly (loud, safe) — but never the reverse,
where folded rows would silently serve as historical state.
"""

from __future__ import annotations

import os


def read_horizon(path: str, fname: str) -> int | None:
    """The store's fold horizon, or None if it has never compacted (any
    bound is then exact — the whole maintenance history is in the log)."""
    try:
        with open(os.path.join(path, fname), encoding="utf-8") as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def stamp_horizon(path: str, fname: str, batch_id: int) -> None:
    """Atomic (tmp + ``os.replace``) horizon publish — call BEFORE the
    generation manifest swap (see module docstring)."""
    tmp = os.path.join(path, "." + fname + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(f"{int(batch_id)}\n")
    os.replace(tmp, os.path.join(path, fname))


def batch_id_of(dir_path: str) -> int:
    """The integer id of a ``batch=<id>`` log dir."""
    return int(os.path.basename(dir_path).split("=")[1])
