"""Crash-safety of the index artifact re-save (ADVICE r4 item 1).

save_index writes run-id-versioned shard files and atomically flips the
manifest LAST, so at every instant the on-disk manifest references a
complete generation: a crash mid-save leaves the previous index fully
loadable, and a stale manifest can never resolve to new shard files.
"""

import json

import numpy as np
import pytest

from monica_tpu.index import artifact
from monica_tpu.index.build import build_index_from_arrays


def _mk(seed, glen=30_000, n=2):
    rng = np.random.default_rng(seed)
    return build_index_from_arrays(
        [rng.integers(0, 4, glen).astype(np.uint8) for _ in range(n)],
        tax_units=[f"Sp_{seed}_{i}" for i in range(n)],
    )


def test_roundtrip_and_stale_cleanup(tmp_path):
    a = _mk(1)
    artifact.save_index(a, tmp_path)
    first_files = set(p.name for p in tmp_path.glob("shard*"))
    b = _mk(2, glen=20_000)
    artifact.save_index(b, tmp_path)
    loaded = artifact.load_index(tmp_path)
    assert loaded.meta.tax_units == b.meta.tax_units
    np.testing.assert_array_equal(
        loaded.shards[0].ref_codes, b.shards[0].ref_codes
    )
    # previous generation garbage-collected after the manifest flip
    assert not (set(p.name for p in tmp_path.glob("shard*")) & first_files)


def test_crash_before_manifest_flip_keeps_previous_index(tmp_path, monkeypatch):
    a = _mk(1)
    artifact.save_index(a, tmp_path)

    b = _mk(2, glen=20_000)
    import os as _os

    real_replace = _os.replace

    def boom(src, dst):
        raise OSError("simulated crash before manifest flip")

    monkeypatch.setattr(artifact.os, "replace", boom)
    with pytest.raises(OSError):
        artifact.save_index(b, tmp_path)
    monkeypatch.setattr(artifact.os, "replace", real_replace)

    # the manifest still names generation A, and A's files are intact
    loaded = artifact.load_index(tmp_path)
    assert loaded.meta.tax_units == a.meta.tax_units
    np.testing.assert_array_equal(
        loaded.shards[0].ref_codes, a.shards[0].ref_codes
    )
    # the next successful save garbage-collects B's orphans
    c = _mk(3, glen=10_000)
    artifact.save_index(c, tmp_path)
    runid = json.load(open(tmp_path / artifact.MANIFEST))["runid"]
    for p in tmp_path.glob("shard*"):
        assert f".{runid}.npy" in p.name, p.name


def test_pre_r5_unversioned_manifest_still_loads(tmp_path):
    """Backward compat: v2 manifests without a runid use unversioned
    shard filenames."""
    a = _mk(4)
    artifact.save_index(a, tmp_path)
    man = json.load(open(tmp_path / artifact.MANIFEST))
    runid = man.pop("runid")
    json.dump(man, open(tmp_path / artifact.MANIFEST, "w"))
    for p in tmp_path.glob("shard*"):
        p.rename(p.with_name(p.name.replace(f".{runid}.npy", ".npy")))
    loaded = artifact.load_index(tmp_path)
    assert loaded.meta.tax_units == a.meta.tax_units
