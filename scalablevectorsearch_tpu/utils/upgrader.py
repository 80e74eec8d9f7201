"""Offline checkpoint schema migration tool.

Analog of the reference's ``upgrader.py``
(``bindings/python/src/.../upgrader.py:65-299``): inspects a saved checkpoint
directory, reports schema/version of every component, and upgrades legacy
layouts in place (writing a backup first).

Current migrations: none needed yet (all schemas at their initial versions);
the registry structure is in place so future format bumps ship with their
``upgrade_<schema>_<from>`` functions.

Usage:
    python -m scalablevectorsearch_tpu.utils.upgrader <checkpoint_dir>
    python -m scalablevectorsearch_tpu.utils.upgrader --check <dir>
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable, Dict, List, Tuple

from ..lib import saveload

# (schema, from_version) -> upgrade function(table, directory) -> new table
_MIGRATIONS: Dict[Tuple[str, str], Callable[[dict, str], dict]] = {}

# newest known version per schema
CURRENT_VERSIONS = {
    "uncompressed_data": "v0.0.2",
    "default_graph": "v0.0.1",
    "sq_dataset": "v0.0.1",
    "lvq_dataset": "v0.0.1",
    "vamana_index_parameters": "v0.0.1",
    "vamana_build_parameters": "v0.0.1",
    "vamana_search_parameters": "v0.0.1",
    "ivf_index_parameters": "v0.0.1",
    "ivf_build_parameters": "v0.0.1",
    "ivf_search_parameters": "v0.0.1",
    "ivf_clustering": "v0.0.1",
    "inverted_index_parameters": "v0.0.1",
    "flat_index": "v0.0.1",
}


def register_migration(schema: str, from_version: str):
    def deco(fn):
        _MIGRATIONS[(schema, from_version)] = fn
        return fn
    return deco


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
    report = []
    for path in _find_config_files(directory):
        with open(path) as f:
            table = json.load(f)
        schema = table.get(saveload.SCHEMA_KEY)
        version = table.get(saveload.VERSION_KEY)
        current = CURRENT_VERSIONS.get(schema)
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
