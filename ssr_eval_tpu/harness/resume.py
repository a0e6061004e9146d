"""Incremental results + sweep resume.

The reference loses every accumulated result on a mid-run crash (the
JSON is written once at the very end, eval.py:219-226; SURVEY §5).  The
engine instead appends one JSONL record per (file, spec) as soon as a
batch's metrics land on host:

    {"path": ..., "key": "proc_fft_24000_44100", "metrics": {...}}

`load_partial` reads such a journal back; `SSR_Eval_Helper.evaluate(...)`
with `resume=True` skips files whose every spec key is already recorded
and merges the journal into the final results dict, so a crashed sweep
continues where it stopped.
"""

from __future__ import annotations

import json
import os


class ResultJournal:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, "a")

    def record(self, file_path: str, key: str, metrics: dict):
        self._fh.write(
            json.dumps({"path": file_path, "key": key, "metrics": metrics}) + "\n"
        )
        self._fh.flush()

    def close(self):
        self._fh.close()


def load_partial(path: str) -> dict:
    """-> {file_path: {key: metrics}} from a (possibly truncated) journal."""
    out = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn final line from a crash
            out.setdefault(rec["path"], {})[rec["key"]] = rec["metrics"]
    return out
