"""Offline checkpoint schema migration tool.

Analog of the reference's ``upgrader.py``
(``bindings/python/src/.../upgrader.py:65-299``): inspects a saved checkpoint
directory, reports schema/version of every component, and upgrades legacy
layouts in place (writing a backup first).

``CURRENT_VERSIONS`` is derived from the saveable classes themselves
(each declares ``SCHEMA``/``VERSION``), so the registry cannot drift from the
code.  Registered migrations:

* ``lvq_dataset`` v0.0.1 -> v0.0.2 — v0.0.1 stored unpadded, unpacked codes
  ``(n, dim)``; v0.0.2 stores lane-padded rows with 4-bit codes nibble-packed.
  The migration rewrites the code blobs (mirrors the in-loader fallback in
  ``quantization/lvq.py``).
* ``vamana_index_parameters`` / ``dynamic_vamana_index_parameters``
  v0.0.1 -> v0.0.2 — additive optional ``entry_sampler`` field.
* ``inverted_build_parameters`` v0.0.1 -> v0.0.2 — additive ``epsilon``
  closure parameters with reference defaults.

Usage:
    python -m scalablevectorsearch_tpu.utils.upgrader <checkpoint_dir>
    python -m scalablevectorsearch_tpu.utils.upgrader --check <dir>
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable, Dict, List, Tuple

import numpy as np

from ..lib import saveload

# (schema, from_version) -> upgrade function(table, directory) -> new table
_MIGRATIONS: Dict[Tuple[str, str], Callable[[dict, str], dict]] = {}

_CURRENT_VERSIONS: Dict[str, str] | None = None


def _saveable_classes() -> list:
    """Every class in the package declaring SCHEMA + VERSION.

    Imported lazily (utils must not import index modules at module scope) and
    enumerated explicitly so a new saveable module is a one-line addition
    here — with the versions themselves always read off the class.
    """
    from ..core import data as core_data
    from ..core import graph as core_graph
    from ..index import flat as index_flat
    from ..index.inverted import index as inverted_index
    from ..index.ivf import clustering as ivf_clustering
    from ..index.ivf import index as ivf_index
    from ..index.ivf import params as ivf_params
    from ..index.vamana import dynamic as vamana_dynamic
    from ..index.vamana import index as vamana_index
    from ..index.vamana import multi as vamana_multi
    from ..index.vamana import params as vamana_params
    from ..quantization import leanvec, lvq, scalar

    classes = []
    for mod in (core_data, core_graph, index_flat, inverted_index,
                ivf_clustering, ivf_index, ivf_params, vamana_dynamic,
                vamana_index, vamana_multi, vamana_params, leanvec, lvq,
                scalar):
        for obj in vars(mod).values():
            if (isinstance(obj, type) and "SCHEMA" in vars(obj)
                    and "VERSION" in vars(obj)):
                classes.append(obj)
    return classes


def current_versions() -> Dict[str, str]:
    """schema -> newest version string, introspected from the classes."""
    global _CURRENT_VERSIONS
    if _CURRENT_VERSIONS is None:
        _CURRENT_VERSIONS = {
            cls.SCHEMA: str(cls.VERSION) for cls in _saveable_classes()}
    return _CURRENT_VERSIONS


def register_migration(schema: str, from_version: str):
    def deco(fn):
        _MIGRATIONS[(schema, from_version)] = fn
        return fn
    return deco


def _bump(table: dict, to_version: str, defaults: dict | None = None) -> dict:
    out = dict(table)
    out[saveload.VERSION_KEY] = to_version
    for key, value in (defaults or {}).items():
        out.setdefault(key, value)
    return out


@register_migration("vamana_index_parameters", "v0.0.1")
def _vamana_params_001(table: dict, _directory: str) -> dict:
    return _bump(table, "v0.0.2", {"entry_sampler": None})


@register_migration("dynamic_vamana_index_parameters", "v0.0.1")
def _dynamic_vamana_params_001(table: dict, _directory: str) -> dict:
    return _bump(table, "v0.0.2", {"entry_sampler": None})


@register_migration("inverted_build_parameters", "v0.0.1")
def _inverted_build_001(table: dict, _directory: str) -> dict:
    return _bump(table, "v0.0.2", {"epsilon": 0.05})


@register_migration("leanvec_dataset", "v0.0.1")
def _leanvec_dataset_001(table: dict, _directory: str) -> dict:
    # v0.0.2 adds an optional query_projection blob (query-aware OOD
    # training); absent means query map == data map, so the bump is additive.
    return _bump(table, "v0.0.2")


@register_migration("lvq_dataset", "v0.0.1")
def _lvq_dataset_001(table: dict, directory: str) -> dict:
    """Rewrite v0.0.1 unpadded/unpacked code blobs into the v0.0.2 layout."""
    from ..lib import datatypes as dt
    from ..quantization.lvq import _pack4

    bits = int(table.get("bits", 8))
    residual_bits = int(table.get("residual_bits", 0))
    dim = int(table["dims"])
    d_pad = dt.padded_dim(dim)

    def repack(blob_name: str, b: int) -> None:
        path = os.path.join(directory, table[blob_name])
        codes = np.load(path).astype(np.int8)
        width = d_pad // (8 // b)
        if codes.shape[1] == width:
            return  # already in the new layout
        padded = np.zeros((codes.shape[0], d_pad), dtype=np.int8)
        padded[:, : codes.shape[1]] = codes
        np.save(path, _pack4(padded) if b == 4 else padded)

    repack("codes", bits)
    if residual_bits:
        repack("res_codes", residual_bits)
    return _bump(table, "v0.0.2")


def _find_config_files(directory: str) -> List[str]:
    hits = []
    for root, _dirs, files in os.walk(directory):
        for name in files:
            if name.endswith(".json") and (
                    name.startswith("svs_config")
                    or name.endswith("_config.json")):
                hits.append(os.path.join(root, name))
    return sorted(hits)


def inspect(directory: str) -> List[dict]:
    """Report every schema table under a checkpoint directory."""
    versions = current_versions()
    report = []
    for path in _find_config_files(directory):
        with open(path) as f:
            table = json.load(f)
        schema = table.get(saveload.SCHEMA_KEY)
        version = table.get(saveload.VERSION_KEY)
        current = versions.get(schema)
        report.append({
            "file": os.path.relpath(path, directory),
            "schema": schema,
            "version": version,
            "current": current,
            "status": ("unknown-schema" if current is None else
                       "up-to-date" if version == current else
                       "upgradable" if (schema, version) in _MIGRATIONS
                       else "stale-no-migration"),
        })
    return report


def upgrade(directory: str, backup: bool = True) -> List[dict]:
    """Apply all registered migrations in place; returns the actions taken."""
    actions = []
    entries = inspect(directory)
    if backup and any(e["status"] == "upgradable" for e in entries):
        bak = directory.rstrip("/").rstrip(os.sep) + ".bak"
        if not os.path.exists(bak):
            shutil.copytree(directory, bak)
            actions.append({"action": "backup", "path": bak})
    for entry in entries:
        if entry["status"] != "upgradable":
            continue
        path = os.path.join(directory, entry["file"])
        with open(path) as f:
            table = json.load(f)
        while (table[saveload.SCHEMA_KEY],
               table[saveload.VERSION_KEY]) in _MIGRATIONS:
            fn = _MIGRATIONS[(table[saveload.SCHEMA_KEY],
                              table[saveload.VERSION_KEY])]
            table = fn(table, os.path.dirname(path))
        with open(path, "w") as f:
            json.dump(table, f, indent=2)
        actions.append({"action": "upgraded", "file": entry["file"],
                        "to": table[saveload.VERSION_KEY]})
    return actions


def main(argv=None) -> int:
    import argparse
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("directory")
    parser.add_argument("--check", action="store_true",
                        help="report only; do not modify")
    args = parser.parse_args(argv)
    report = inspect(args.directory)
    if args.check or all(e["status"] in ("up-to-date", "unknown-schema")
                         for e in report):
        print(json.dumps(report, indent=2))
        return 0
    actions = upgrade(args.directory)
    print(json.dumps({"report": report, "actions": actions}, indent=2))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
