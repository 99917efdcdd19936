"""Scene-asset resolution.

The framework ships its demo/test scenes in ``<repo>/scenes`` (vendored
data fixtures — see ``scenes/PROVENANCE.md``), so the suite, benchmarks,
and the driver entry run without the upstream reference tree mounted.
``PTDN_SCENES_DIR`` (or an explicit ``--scenes-dir``) points everything
at a different copy, e.g. the upstream originals.
"""

from __future__ import annotations

import os
import pathlib

REPO_SCENES = pathlib.Path(__file__).resolve().parents[2] / "scenes"


def scenes_dir() -> pathlib.Path:
    """The active scene directory (env override > vendored copy)."""
    return pathlib.Path(os.environ.get("PTDN_SCENES_DIR", REPO_SCENES))


def scene_path(name: str) -> str:
    """Resolve a scene by short name ('cornell') or filename
    ('cornell.txt') against the active scene directory."""
    if not name.endswith(".txt"):
        name += ".txt"
    return str(scenes_dir() / name)
