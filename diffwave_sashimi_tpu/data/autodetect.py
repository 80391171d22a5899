"""Real-dataset auto-detection.

The image this framework builds in has no SC09/LJSpeech; the quality
loop (scripts/fidelity.py, eval/) runs on synthetic corpora until real
data appears.  This module is the zero-code-change hook: the moment a
real dataset lands in any of the conventional locations (or is pointed
to by ``DWST_DATA_ROOT``), :func:`detect` finds it and the quality
scripts pick it up automatically.

Reference parity: the reference hard-codes relative ``data/...`` paths
in its dataset configs (reference configs/dataset/sc09.yaml:2,
ljspeech.yaml:2) and documents manual download (reference README.md);
auto-detection is the rebuild's convenience superset of that contract.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

# Conventional roots, searched in order; DWST_DATA_ROOT is prepended.
_ROOTS = ("data", "/root/data", "/data", os.path.expanduser("~/datasets"))

# dataset key -> (candidate subdir patterns, filename probe glob)
_SIGNATURES = {
    # SC09: Speech Commands digits; the walker requires the _nohash_
    # naming (data/sc09.py parity with the reference's SpeechCommands)
    "sc09": (("sc09", "SC09", "speech_commands/sc09"),
             "*_nohash_*.wav"),
    # LJSpeech: flat wav dir of LJ###-####.wav
    "ljspeech": (("LJSpeech-1.1/wavs", "ljspeech/wavs", "LJSpeech/wavs"),
                 "LJ*.wav"),
}


def detect(name: str, min_files: int = 8) -> Optional[str]:
    """Path of a real ``name`` dataset if one exists locally, else None.

    A directory counts when it holds at least ``min_files`` files
    matching the dataset's filename signature — enough to rule out
    placeholder dirs without walking huge trees.
    """
    try:
        subdirs, probe = _SIGNATURES[name]
    except KeyError:
        raise ValueError(f"unknown dataset {name!r}; "
                         f"known: {sorted(_SIGNATURES)}") from None
    roots = _ROOTS
    env = os.environ.get("DWST_DATA_ROOT")
    if env:
        roots = (env,) + roots
    for root in roots:
        for sub in subdirs:
            d = os.path.join(root, sub)
            if not os.path.isdir(d):
                continue
            hits = glob.glob(os.path.join(d, probe))
            if len(hits) >= min_files:
                return d
    return None
