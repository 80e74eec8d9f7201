"""Reference (intel/ScalableVectorSearch) checkpoint-directory interop.

The reference saves every serializable object as a directory containing an
``svs_config.toml`` (``include/svs/lib/saveload/core.h:41``): a versioned
tree of tables keyed by ``__schema__``/``__version__``, with binary blobs in
sibling ``.svs`` V1 data files (``include/svs/lib/saveload/load.h:869``).
A full Vamana index save is three such directories — config
(``vamana_index_parameters``, ``include/svs/index/vamana/index.h``), graph
(``default_graph``, ``include/svs/core/graph/graph.h:277-288``: an
``(n, R+1)`` uint32 blob whose leading column is the per-row degree), and
data (``uncompressed_data``, ``include/svs/core/data/simple.h:69-81``).

This module reads those directories into native TPU-side objects
(`load_reference_vamana`) and writes our indexes back out in the reference
layout (`save_reference_vamana`) for migration in both directions.  Only the
uncompressed f32/f16 data path is supported — the reference's LVQ blobs are
ABI-opaque (``api_defs.h``) and are re-quantized on import instead.
"""

from __future__ import annotations

import os
import tomllib
from typing import Optional

import numpy as np

from ..core import io as core_io

_SUPPORTED_ELTYPES = {
    "float32": np.float32, "float16": np.float16, "bfloat16": None,
    "uint32": np.uint32, "int32": np.int32, "uint8": np.uint8,
    "int8": np.int8,
}


def load_config(directory: str) -> dict:
    """Parse a reference ``svs_config.toml`` and return the ``[object]``
    table (schema/version keys included)."""
    path = os.path.join(directory, "svs_config.toml")
    with open(path, "rb") as f:
        tree = tomllib.load(f)
    if "object" not in tree:
        raise ValueError(f"{path}: no [object] table")
    return tree["object"]


def _blob_path(directory: str, table: dict) -> str:
    """Resolve a table's binary blob the way the reference does: by matching
    the config's ``uuid`` against blob header UUIDs (``io::find_uuid``,
    core/data/simple.h:130-134 — there is no filename fallback there).  We
    additionally fall back to ``binary_file`` for configs without a uuid."""
    uuid = table.get("uuid")
    if uuid:
        path = core_io.find_svs_by_uuid(directory, str(uuid))
        if path is not None:
            return path
    name = table.get("binary_file")
    if not name:
        raise ValueError(
            f"table {table.get('__schema__')}: could not resolve blob "
            f"(uuid {uuid!r} not found and no binary_file)")
    return os.path.join(directory, name)


def load_reference_data(directory: str) -> np.ndarray:
    """Load a reference ``uncompressed_data`` directory into an array."""
    table = load_config(directory)
    if table.get("__schema__") != "uncompressed_data":
        raise ValueError(f"expected uncompressed_data, got "
                         f"{table.get('__schema__')}")
    eltype = table.get("eltype", "float32")
    if eltype == "bfloat16":
        raw = core_io.read_svs(_blob_path(directory, table), dtype=np.uint16)
        arr = raw.astype(np.uint32) << 16       # bf16 bits -> f32 bits
        out = arr.view(np.float32)
        return out.reshape(int(table["num_vectors"]), int(table["dims"]))
    dtype = _SUPPORTED_ELTYPES.get(eltype)
    if dtype is None:
        raise ValueError(f"unsupported eltype {eltype}")
    out = core_io.read_svs(_blob_path(directory, table), dtype=dtype)
    n, d = int(table["num_vectors"]), int(table["dims"])
    return out.reshape(n, d)


def load_reference_graph(directory: str) -> np.ndarray:
    """Load a reference ``default_graph`` directory into a dense (n, R)
    −1-padded int32 adjacency (our convention)."""
    table = load_config(directory)
    if table.get("__schema__") != "default_graph":
        raise ValueError(f"expected default_graph, got "
                         f"{table.get('__schema__')}")
    n = int(table["num_vertices"])
    r = int(table["max_degree"])
    raw = core_io.read_svs(_blob_path(directory, table),
                           dtype=np.uint32).reshape(n, r + 1)
    degs = raw[:, 0].astype(np.int64)
    adj = raw[:, 1:].astype(np.int64)
    cols = np.arange(r)[None, :]
    return np.where(cols < degs[:, None], adj, -1).astype(np.int32)


def load_reference_vamana(config_dir: str,
                          graph_dir: Optional[str] = None,
                          data_dir: Optional[str] = None,
                          distance="l2"):
    """Assemble a reference-saved Vamana index directory triple.

    Mirrors the reference's ``svs.Vamana(config, graph, data, distance)``
    assemble call: the distance is a caller argument there too (the config
    table does not record it)."""
    from ..core.data import VectorDataset
    from ..core.graph import NeighborGraph
    from ..index.vamana.index import VamanaIndex
    from ..index.vamana.params import (SearchBufferConfig,
                                       VamanaBuildParameters,
                                       VamanaSearchParameters)

    graph_dir = graph_dir or config_dir
    data_dir = data_dir or config_dir
    table = load_config(config_dir)
    if table.get("__schema__") != "vamana_index_parameters":
        raise ValueError(f"expected vamana_index_parameters, got "
                         f"{table.get('__schema__')}")
    adj = load_reference_graph(graph_dir)
    arr = load_reference_data(data_dir)
    bp_t = table.get("build_parameters", {})
    bp = VamanaBuildParameters(
        alpha=float(bp_t.get("alpha", 1.2)),
        graph_max_degree=int(bp_t.get("graph_max_degree", adj.shape[1])),
        window_size=int(bp_t.get("window_size", 64)),
        max_candidate_pool_size=int(bp_t.get("max_candidate_pool_size",
                                             750)),
        prune_to=int(bp_t.get("prune_to", adj.shape[1])),
        use_full_search_history=bool(bp_t.get("use_full_search_history",
                                              True)))
    sp_t = table.get("search_parameters", {})
    window = int(sp_t.get("search_window_size", 0)) or bp.window_size
    cap = int(sp_t.get("search_buffer_capacity", 0)) or window
    sp = VamanaSearchParameters(
        buffer_config=SearchBufferConfig(window, max(cap, window)))
    return VamanaIndex(NeighborGraph.from_array(adj),
                       VectorDataset.from_array(arr),
                       int(table["entry_point"]), distance,
                       build_parameters=bp, search_parameters=sp)


# ---------------------------------------------------------------------------
# Writing the reference layout
# ---------------------------------------------------------------------------

def _toml_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    # basic (double-quoted) TOML string with backslash escaping — literal
    # single-quoted strings have NO escape syntax in TOML
    s = str(v).replace("\\", "\\\\").replace('"', '\\"')
    return f'"{s}"'


def _write_table(lines, name, table, indent=""):
    lines.append(f"{indent}[{name}]")
    sub = {}
    for k, v in table.items():
        if isinstance(v, dict):
            sub[k] = v
        else:
            lines.append(f"{indent}{k} = {_toml_value(v)}")
    for k, v in sub.items():
        lines.append("")
        _write_table(lines, f"{name}.{k}", v, indent + "    ")


def write_config(directory: str, table: dict) -> None:
    """Write a reference-layout ``svs_config.toml``."""
    os.makedirs(directory, exist_ok=True)
    lines = ["__version__ = 'v0.0.2'", ""]
    _write_table(lines, "object", table)
    with open(os.path.join(directory, "svs_config.toml"), "w") as f:
        f.write("\n".join(lines) + "\n")


def save_reference_vamana(index, config_dir: str,
                          graph_dir: Optional[str] = None,
                          data_dir: Optional[str] = None) -> None:
    """Write a VamanaIndex as reference-layout directories (config / graph /
    data; see module docstring for the schemas)."""
    import uuid as _uuid

    if getattr(index, "_entry_cfg", None) is not None:
        import warnings
        warnings.warn(
            "exporting an index with the entry sampler enabled: the "
            "reference has no per-query entry selection, and a graph built "
            "with sampled_entries=True keeps no medioid approach path — "
            "the reference will search it from the medioid with severely "
            "degraded recall", stacklevel=2)

    graph_dir = graph_dir or config_dir
    data_dir = data_dir or config_dir
    adj = index.graph.to_numpy()                       # (n, R), -1 padded
    n, r = adj.shape
    degs = (adj >= 0).sum(axis=1).astype(np.uint32)
    raw = np.concatenate(
        [degs[:, None], np.maximum(adj, 0).astype(np.uint32)], axis=1)
    os.makedirs(graph_dir, exist_ok=True)
    # one UUID per blob, embedded in BOTH the blob header and the config —
    # the reference resolves blobs by this match (io::find_uuid,
    # core/graph/graph.h:326-327; no filename fallback)
    graph_uuid = str(_uuid.uuid4())
    core_io.write_svs(os.path.join(graph_dir, "graph.svs"),
                      raw.astype(np.uint32), uuid=graph_uuid)
    write_config(graph_dir, {
        "__schema__": "default_graph", "__version__": "v0.0.0",
        "name": "graph", "binary_file": "graph.svs",
        "uuid": graph_uuid, "eltype": "uint32",
        "max_degree": r, "num_vertices": n,
    })

    arr = index.data.to_numpy().astype(np.float32)
    os.makedirs(data_dir, exist_ok=True)
    data_uuid = str(_uuid.uuid4())
    core_io.write_svs(os.path.join(data_dir, "data.svs"), arr,
                      uuid=data_uuid)
    write_config(data_dir, {
        "__schema__": "uncompressed_data", "__version__": "v0.0.0",
        "name": "uncompressed", "binary_file": "data.svs",
        "uuid": data_uuid, "eltype": "float32",
        "num_vectors": arr.shape[0], "dims": arr.shape[1],
    })

    bp = index.build_parameters
    sp = index.search_parameters.buffer_config
    table = {
        "__schema__": "vamana_index_parameters", "__version__": "v0.0.3",
        "name": "vamana index parameters",
        "entry_point": int(index.entry_point),
        "build_parameters": {
            "__schema__": "vamana_build_parameters",
            "__version__": "v0.0.1",
            "name": "vamana build parameters",
            "alpha": float(bp.alpha) if bp else 1.2,
            "graph_max_degree": int(bp.graph_max_degree) if bp else r,
            "max_candidate_pool_size":
                int(bp.max_candidate_pool_size) if bp else 750,
            "prune_to": int(bp.prune_to) if bp else r,
            "use_full_search_history":
                bool(bp.use_full_search_history) if bp else True,
            "window_size": int(bp.window_size) if bp else 64,
        },
        "search_parameters": {
            "__schema__": "vamana_search_parameters",
            "__version__": "v0.0.1",
            "search_window_size": int(sp.search_window_size),
            "search_buffer_capacity": int(sp.search_buffer_capacity),
            "search_buffer_visited_set": False,
            "prefetch_lookahead": 0, "prefetch_step": 0,
        },
    }
    write_config(config_dir, table)
