"""Checkpoint manifest for resumable builds.

Port of the reference's crash-safe snapshot discipline
(``/root/reference/internal/services/fts/persist/atomic.go:34-98``: write to
a same-directory temp file, flush, then ``os.Rename``) applied to a build
manifest instead of gob envelopes: each completed build step (docs table,
postings wave, term stats, meta) is recorded with metrics; a re-run skips
committed steps (the load-skip-rebuild short-circuit,
``cmd/fts/main.go:272-280``, SURVEY.md §4 P8/P9).

Spark's own task-commit protocol makes each *write* atomic; the manifest
makes the multi-job *build* atomic at wave granularity.
"""

from __future__ import annotations

import json
import os
import tempfile
import time


def atomic_write_json(path: str, payload: dict) -> None:
    """Temp file in the same dir + fsync + rename (atomic.go pattern)."""
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(prefix=".tmp-", dir=d)
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


class Manifest:
    """Per-index build manifest: step name → {completed_at, metrics}."""

    FILENAME = "_manifest.json"

    def __init__(self, index_dir: str):
        self.path = os.path.join(index_dir, self.FILENAME)
        self._state: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._state = json.load(f)

    def is_done(self, step: str) -> bool:
        return step in self._state

    def mark_done(self, step: str, metrics: dict | None = None) -> None:
        self._state[step] = {
            "completed_at": time.time(),
            "metrics": metrics or {},
        }
        atomic_write_json(self.path, self._state)

    def steps(self) -> dict[str, dict]:
        return dict(self._state)

    def reset(self) -> None:
        self._state = {}
        if os.path.exists(self.path):
            os.unlink(self.path)
