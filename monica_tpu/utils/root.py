"""Persistent-state root directory management.

The reference bootstraps a ``~/.monica`` root with a ``.root`` redirect
file that every module re-reads at import time
(`monica/monica.py:10-19`, `monica/genomes/fetcher.py:16-17`).  Here the
same capability (relocatable heavy-state root, `monica initialize`) is a
small explicit API instead of import-time globals, so tests can point it
anywhere.

Layout under the root::

    <root>/.root            redirect file (absolute path of active root)
    <root>/genomes/         downloaded genome cache ("oldies" analog)
    <root>/tables/          NCBI assembly summary cache
    <root>/indexes/         built index artifacts (the .mmi-dir analog)
    <root>/monica.params    last-run parameter dump
"""

from __future__ import annotations

import json
import os
from pathlib import Path

_ENV_VAR = "MONICA_TPU_ROOT"
_HOME_DIRNAME = ".monica_tpu"


def default_home() -> Path:
    return Path(os.path.expanduser("~")) / _HOME_DIRNAME


def resolve_root(explicit: str | os.PathLike | None = None) -> Path:
    """Return the active state root, creating it if needed.

    Priority: explicit argument > $MONICA_TPU_ROOT > ~/.monica_tpu/.root
    redirect > ~/.monica_tpu itself.
    """
    if explicit is not None:
        root = Path(explicit)
    elif _ENV_VAR in os.environ:
        root = Path(os.environ[_ENV_VAR])
    else:
        home = default_home()
        redirect = home / ".root"
        if redirect.exists():
            root = Path(redirect.read_text().splitlines()[0].strip())
        else:
            root = home
    root.mkdir(parents=True, exist_ok=True)
    return root


def initialize(new_root: str | os.PathLike) -> Path:
    """Relocate the state root (reference: `main_initialize`, monica.py:791-799).

    Writes the redirect file in the *home* location pointing at
    ``new_root`` so later invocations pick it up.
    """
    home = default_home()
    home.mkdir(parents=True, exist_ok=True)
    new_root = Path(new_root).absolute()
    new_root.mkdir(parents=True, exist_ok=True)
    (home / ".root").write_text(str(new_root))
    return new_root


def subdir(root: Path, name: str) -> Path:
    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    return d


def genomes_dir(root: Path) -> Path:
    return subdir(root, "genomes")


def tables_dir(root: Path) -> Path:
    return subdir(root, "tables")


def indexes_dir(root: Path) -> Path:
    return subdir(root, "indexes")


def dump_params(root: Path, params: dict) -> None:
    """Parameter dump for reproducibility (reference: monica.py:142-143)."""
    with open(root / "monica.params", "w") as fh:
        json.dump({k: _jsonable(v) for k, v in params.items()}, fh, indent=2, default=str)


def _jsonable(v):
    if isinstance(v, Path):
        return str(v)
    return v
